"""Pattern base (reference: odibi/patterns/base.py:13-56): a pattern is
a named, validated, executable warehouse recipe."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class Pattern(ABC):
    name: str = "pattern"
    required_params: tuple[str, ...] = ()

    def __init__(self, **params: Any):
        self.params = params
        self.validate()

    def validate(self) -> None:
        missing = [p for p in self.required_params if p not in self.params]
        if missing:
            raise ValueError(f"pattern '{self.name}' missing params: {missing}")

    @abstractmethod
    def execute(self, spark: SparkSession, df: DataFrame) -> DataFrame | None: ...
