"""Orchestrator exporters: generate Airflow DAG / Dagster definitions
code from a pipeline YAML (reference: odibi/orchestration/airflow.py,
dagster.py — the exported tasks shell out to the CLI per node, so the
orchestrator owns scheduling/retries while the engine owns execution).
"""

from odibi_spark.orchestration.airflow import render_airflow_dag
from odibi_spark.orchestration.dagster import (
    DagsterFactory,
    render_dagster_definitions,
)

__all__ = [
    "render_airflow_dag",
    "render_dagster_definitions",
    "DagsterFactory",
]
