"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool for EXTREME hot keys (one
key holding a double-digit percentage of rows), where even split
partitions of the hot key overwhelm single tasks.

``salted_join``: the big/skewed side gets a random salt in [0, n);
the small side is replicated n ways; the join key becomes (key, salt).
The hot key's rows spread across n tasks at the cost of replicating
the other side n×. Classic-but-manual — use only when AQE isn't enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform


def salted_join_frames(
    skewed: DataFrame,
    other: DataFrame,
    *,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt left, replicate right.

    Only inner/left are correct under this construction: with right/full,
    unmatched right rows would surface once per replicated salt value.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got '{how}'); "
            "for right/full joins use a plain join and let AQE handle skew"
        )
    salted_left = skewed.withColumn(
        "__salt", (F.rand(seed) * salt_buckets).cast("int")
    )
    replicated_right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_left.join(replicated_right, [*on, "__salt"], how)
    return out.drop("__salt")


@transform("salted_join")
def salted_join(
    ctx: EngineContext,
    *,
    right: str | DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> EngineContext:
    rdf = right if isinstance(right, DataFrame) else ctx.context.get(right)
    return ctx.with_df(
        salted_join_frames(ctx.df, rdf, on=on, salt_buckets=salt_buckets, how=how)
    )
