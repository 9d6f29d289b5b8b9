"""Declared query workloads: every entry pairs a Spark implementation
(built on the odibi_spark operator library) with a DuckDB oracle SQL
string, forming the driver's correctness gate (CORRECTNESS_r{N}.json).

Conventions for hash-stable oracle parity (SURVEY §7.3 dialect notes):
- SUM over doubles goes through DECIMAL(18,4) (exact, order-independent)
  and is cast back to DOUBLE; averages divide that exact sum by the
  count in double — both engines then produce bit-identical values.
- Every computed column is aliased identically on both sides.
- LIMIT/top-k queries always order by a unique tiebreak.
- Session timezone is pinned to UTC inside each query.
"""

from odibi_spark.workloads.core import ORACLES as _CORE_ORACLES
from odibi_spark.workloads.core import QUERIES as _CORE_QUERIES
from odibi_spark.workloads.extras import ORACLES as _EXTRA_ORACLES
from odibi_spark.workloads.extras import QUERIES as _EXTRA_QUERIES
from odibi_spark.workloads.llmdata import ORACLES as _LLM_ORACLES
from odibi_spark.workloads.llmdata import QUERIES as _LLM_QUERIES
from odibi_spark.workloads.tpch import ORACLES as _TPCH_ORACLES
from odibi_spark.workloads.tpch import QUERIES as _TPCH_QUERIES
from odibi_spark.workloads.tpch2 import ORACLES as _TPCH2_ORACLES
from odibi_spark.workloads.tpch2 import QUERIES as _TPCH2_QUERIES

QUERIES = {
    **_CORE_QUERIES, **_LLM_QUERIES, **_EXTRA_QUERIES,
    **_TPCH_QUERIES, **_TPCH2_QUERIES,
}
ORACLES = {
    **_CORE_ORACLES, **_LLM_ORACLES, **_EXTRA_ORACLES,
    **_TPCH_ORACLES, **_TPCH2_ORACLES,
}

__all__ = ["QUERIES", "ORACLES"]
