"""Fuzzy (edit-distance) match join — entity resolution over string
keys without a cartesian product.

Beyond-reference addition (the reference's closest surface is
dict_based_mapping / lookup joins, odibi/transformers/advanced.py):
the standard "match customer names across systems" workload.

Plan shape: candidates come from ANCHOR BLOCKING — two equi-joins
(normalized prefix, normalized suffix) unioned and deduped — then the
surviving pairs pay one JVM-side ``levenshtein`` each. Never all
pairs: cost is bucket density x 2, the same bucketize-then-refine
discipline as the LSH/banding dedup family.

Completeness: a single edit cannot touch both the first ``anchor``
characters and the last ``anchor`` characters of a string longer than
``2 x anchor``, so for ``max_distance=1`` (and strings longer than
2 x anchor) the anchor pair is a COMPLETE filter — no true match is
lost. For ``max_distance >= 2`` blocking is approximate (documented
recall trade: k edits can destroy both anchors); raise ``anchor``
count/length or pre-normalize harder when recall matters more than
cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform


def fuzzy_match_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
    anchor: int = 2,
    normalize: bool = True,
    distance_col: str = "edit_distance",
) -> DataFrame:
    """Join rows whose strings are within ``max_distance`` edits,
    candidates via prefix/suffix anchor blocking (complete for
    ``max_distance=1``; approximate above — see module docstring).

    Output: all left columns + all right columns (collisions suffixed
    ``_r``) + ``distance_col``.
    """
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")

    def norm(c):
        col = F.col(c)
        return F.lower(F.trim(col)) if normalize else col

    r2 = right
    renames = {}
    for c in right.columns:
        if c in left.columns:
            r2 = r2.withColumnRenamed(c, c + "_r")
            renames[c] = c + "_r"
    rcol = renames.get(right_col, right_col)

    ln = norm(left_col)
    rn = norm(rcol)
    lpre = left.withColumn("__k", F.substring(ln, 1, anchor))
    rpre = r2.withColumn("__k", F.substring(rn, 1, anchor))
    lsuf = left.withColumn("__k", F.substring(ln, -anchor, anchor))
    rsuf = r2.withColumn("__k", F.substring(rn, -anchor, anchor))
    cands = (
        lpre.join(rpre, "__k")
        .unionByName(lsuf.join(rsuf, "__k"))
        .drop("__k")
        .distinct()
    )
    dist = F.levenshtein(ln, rn)
    return cands.withColumn(distance_col, dist).filter(
        F.col(distance_col) <= max_distance
    )


@transform("fuzzy_match")
def fuzzy_match(
    ctx: EngineContext,
    *,
    right: DataFrame,
    left_column: str,
    right_column: str,
    max_distance: int = 1,
    anchor: int = 2,
    normalize: bool = True,
) -> EngineContext:
    """YAML surface: fuzzy match join against another dataset."""
    return ctx.with_df(
        fuzzy_match_join(
            ctx.df, right, left_col=left_column, right_col=right_column,
            max_distance=max_distance, anchor=anchor, normalize=normalize,
        )
    )
