"""odibi_spark — a PySpark-native analytics/pipeline engine.

A from-scratch rebuild of the capabilities of the reference framework
(henryodibi11/Odibi, surveyed in SURVEY.md): a declarative pipeline
engine (read -> transform chain -> validate -> write over a DAG) with
a named-operator library, warehouse patterns (SCD2/merge/fact/dim),
a semantic metrics layer, incremental/HWM state, validation with
quarantine/gates, and streaming ingestion — re-expressed Spark-first:

- one engine: pyspark.sql.DataFrame + Spark SQL (Catalyst/Tungsten);
- operators are ``DataFrame -> DataFrame`` functions registered by
  name (reference: odibi/registry.py, odibi/transformers/__init__.py);
- the named-dataset Context is backed by Spark temp views
  (reference: odibi/context.py:374-520);
- warehouse merge semantics target Delta MERGE at scale, with a
  parquet overwrite-merge emulation for environments without Delta.

Beyond the reference surface, ``odibi_spark.llm`` adds the operators a
large-scale LLM training-data pipeline needs (dedup families,
similarity search, text analysis, multimodal plumbing).
"""

from odibi_spark.session import get_spark
from odibi_spark.context import Context, EngineContext
from odibi_spark.registry import FunctionRegistry, transform, get_registry

# importing the operators package registers every named operator;
# the llm package registers the training-data transforms (text stats,
# dedup families, similarity search) under the same registry
from odibi_spark import operators as _operators  # noqa: E402,F401
from odibi_spark import llm as _llm  # noqa: E402,F401

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Context",
    "EngineContext",
    "FunctionRegistry",
    "transform",
    "get_registry",
    "__version__",
]
