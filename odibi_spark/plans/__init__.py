from odibi_spark.plans.config import NodeConfig, PipelineConfig
from odibi_spark.plans.graph import DependencyGraph, GraphError
from odibi_spark.plans.pipeline import Pipeline

__all__ = ["NodeConfig", "PipelineConfig", "DependencyGraph", "GraphError", "Pipeline"]
