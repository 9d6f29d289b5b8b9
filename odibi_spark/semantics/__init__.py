from odibi_spark.semantics.metrics import Dimension, Metric, SemanticModel
from odibi_spark.semantics.query import SemanticQuery

__all__ = ["Metric", "Dimension", "SemanticModel", "SemanticQuery"]
