from odibi_spark.validation.engine import (
    TestResult,
    ValidationOutcome,
    run_validation,
)
from odibi_spark.validation.fk import validate_foreign_key
from odibi_spark.validation.gate import GateFailure, apply_gate

__all__ = [
    "run_validation",
    "TestResult",
    "ValidationOutcome",
    "validate_foreign_key",
    "apply_gate",
    "GateFailure",
]
