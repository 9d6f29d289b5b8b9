"""Bloom-prefiltered joins — an explicit runtime-filter operator for
joins whose small side is too big to broadcast as a hash relation but
still selective against the big side.

The pattern: build a pure-SQL bitmap Bloom filter over the dim keys
(~2 bytes/item at the defaults vs 8+ for a hash set — the same
machinery as the decontamination prefilter, llm/curation.py:26),
broadcast the tiny bitmap table, and filter the fact side INSIDE
whole-stage codegen BEFORE its exchange; the exact join afterwards
removes the ~0.5% false positives, so the output is row-identical to
the plain join.

MEASURED trade (bench.py ``bloom_join`` probe, local[32], sf0.1,
sort-merge regime, A/B warm): the probe costs ~1.4 us/fact-row (three
broadcast bitmap lookups + byte extraction) while a LOCAL sort-merge
shuffle moves a narrow row for ~0.25 us — so on a single node the
prefilter LOSES at every size tried (150k-9M fact rows, ratio 4-7x),
and the probe reports that number honestly. Use it only where the
avoided shuffle genuinely costs more than the probe:

- network+spill-bound cluster shuffles of WIDE rows (documents with
  text bodies: per-row shuffle cost is tens of us, 10-100x the
  probe), especially the anti/blocklist direction where definite
  non-members skip the join entirely;
- when the alternative is broadcasting a multi-GB key set outright —
  the decontamination-grams case, where the bitmap variant is PROVEN
  faster (llm/curation.py Bloom prefilter cuts the broadcast
  10-30x, r6).

For narrow-row equi-joins on one box, keep the plain join; Spark's
own runtime Bloom injection
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) makes the same
call adaptively when its thresholds allow.

No reference counterpart — the reference's join layer
(odibi/transformers/relational.py) always joins directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform


def bloom_semijoin_frames(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str | None = None,
    how: str = "semi",
    bits_per_item: int = 16,
    hashes: int = 3,
) -> DataFrame:
    """``left`` semi/inner-joined to ``right`` with a Bloom prefilter
    on the left side. Output is row-identical to the plain join (the
    Bloom has no false negatives; the exact join removes false
    positives) — only the plan changes: left rows whose key cannot be
    in ``right`` are dropped before any exchange.

    ``how``: "semi" (left rows that have a match, left columns only)
    or "inner" (matched rows with right columns, duplicate keys
    multiplying as usual).
    """
    from odibi_spark.llm.curation import bloom_might_contain, gram_bloom

    if how not in ("semi", "inner"):
        raise ValueError(
            f"bloom_semijoin supports how='semi'|'inner', got '{how}' — "
            "for the anti direction use bloom_antijoin (definite "
            "non-members bypass the join entirely)"
        )
    rkey = right_on or left_on
    keys = right.select(rkey)
    bloom, m, k = gram_bloom(
        keys, col=rkey, bits_per_item=bits_per_item, hashes=hashes
    )
    pre = bloom_might_contain(left, bloom, m, k, col=left_on)
    cond = pre[left_on] == right[rkey] if rkey != left_on else left_on
    if how == "semi":
        if rkey == left_on:
            return pre.join(right.select(rkey).distinct(), on=left_on,
                            how="left_semi")
        return pre.join(right, on=cond, how="left_semi")
    if rkey == left_on:
        return pre.join(right, on=left_on, how="inner")
    return pre.join(right, on=cond, how="inner")


def bloom_antijoin_frames(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str | None = None,
    bits_per_item: int = 16,
    hashes: int = 3,
) -> DataFrame:
    """``left`` rows with NO match in ``right`` (left_anti), with the
    Bloom doing the opposite of the semijoin's work: a row whose key
    the filter does NOT contain is a DEFINITE non-member (Bloom has no
    false negatives) and passes immediately with no join at all; only
    the maybe-members (true members + ~0.5% FPs) go through the exact
    anti join. For blocklist-shaped workloads (drop documents matching
    a contamination list) the anti side is tiny, so almost the whole
    corpus bypasses the shuffle.

    Output is row-identical to ``left.join(right, ..., "left_anti")``.
    The two branches (definite-out, maybe) are complementary filters
    over the same scan lineage — columnar sources read twice but
    cheaply (the probe is codegen over the scan); persist ``left``
    first when its lineage is expensive to recompute.
    """
    from odibi_spark.llm.curation import bloom_might_contain, gram_bloom

    rkey = right_on or left_on
    keys = right.select(rkey)
    bloom, m, k = gram_bloom(
        keys, col=rkey, bits_per_item=bits_per_item, hashes=hashes
    )
    definite_out = bloom_might_contain(
        left, bloom, m, k, col=left_on, negate=True
    )
    maybe = bloom_might_contain(left, bloom, m, k, col=left_on)
    if rkey == left_on:
        survivors = maybe.join(
            right.select(rkey).distinct(), on=left_on, how="left_anti"
        )
    else:
        survivors = maybe.join(
            right, maybe[left_on] == right[rkey], "left_anti"
        )
    return definite_out.unionByName(survivors)


@transform("bloom_semijoin")
def bloom_semijoin(
    ctx: EngineContext,
    *,
    right: str | DataFrame,
    left_on: str,
    right_on: str | None = None,
    how: str = "semi",
    bits_per_item: int = 16,
    hashes: int = 3,
) -> EngineContext:
    """YAML surface: ``right`` is a registered dataset name (like the
    ``join`` transform's)."""
    rdf = ctx.context.get(right) if isinstance(right, str) else right
    return ctx.with_df(
        bloom_semijoin_frames(
            ctx.df, rdf, left_on=left_on, right_on=right_on, how=how,
            bits_per_item=bits_per_item, hashes=hashes,
        )
    )


@transform("bloom_antijoin")
def bloom_antijoin(
    ctx: EngineContext,
    *,
    right: str | DataFrame,
    left_on: str,
    right_on: str | None = None,
    bits_per_item: int = 16,
    hashes: int = 3,
) -> EngineContext:
    """YAML surface for the anti direction (blocklist filtering)."""
    rdf = ctx.context.get(right) if isinstance(right, str) else right
    return ctx.with_df(
        bloom_antijoin_frames(
            ctx.df, rdf, left_on=left_on, right_on=right_on,
            bits_per_item=bits_per_item, hashes=hashes,
        )
    )
