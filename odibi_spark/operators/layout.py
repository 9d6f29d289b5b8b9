"""Multi-dimensional data layout for scan pruning: Z-order (Morton)
interleaving.

The reference exposes Delta's ``OPTIMIZE ZORDER BY`` / liquid
``cluster_by`` as write options (reference spark_engine.py:1390-1424,
1530-1559) — engine-managed and unavailable without Delta. This module
is the open equivalent for plain parquet: bucket each clustering
column, interleave the bucket bits into a single Morton key, and
range-partition + sort the write by that key. Files (and row groups
within them) then have TIGHT min/max ranges on EVERY clustering
column, so a predicate on any one of them prunes most of the data —
the property a single-column sort only gives its leading column.

Math is the textbook Morton code (bit interleaving), computed entirely
with JVM bit expressions — portable, and reproducible in any engine
with shift/and ops (the differential oracle recomputes it in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform


def interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each (integer) bucket
    column: output bit (i * n_cols + j) = bit i of column j. With
    ``bits * len(cols) <= 63`` the key fits a LONG. Pure bit
    arithmetic — whole-stage codegen, no shuffle."""
    n = len(bucket_cols)
    if n == 0:
        raise ValueError("need at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed long")
    out = F.lit(0).cast("long")
    for j, c in enumerate(bucket_cols):
        b = c.cast("long")
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return out


def uniform_bucket(col: Column, lo: float, hi: float, n_buckets: int) -> Column:
    """Map a numeric column onto ``[0, n_buckets)`` by uniform range
    split between the (precomputed) ``lo``/``hi`` literals. Values at
    ``hi`` land in the top bucket. Skewed distributions get skewed
    bucket occupancy — acceptable for layout (keys stay ordered);
    swap in quantile boundaries when skew is extreme."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    raw = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(span) * n_buckets)
    return F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), raw)).cast("long")


def quantile_bucket(col: Column, boundaries: list[float]) -> Column:
    """Map a numeric column onto ``[0, len(boundaries)]`` by counting
    how many (precomputed, sorted) quantile boundaries the value
    exceeds — equal-frequency cells regardless of distribution shape.
    O(boundaries) comparisons per row, whole-stage codegen."""
    out = F.lit(0).cast("long")
    for b in boundaries:
        out = out + (col > F.lit(float(b))).cast("long")
    return out


def zorder_key(
    df: DataFrame, cols: list[str], *, bits: int | None = None,
    key_col: str = "z_key", bucket_mode: str = "uniform",
) -> DataFrame:
    """Add a Morton key over ``cols`` (numeric / date / timestamp).

    ``bucket_mode='uniform'`` (default): one O(1)-row aggregate
    collects each column's min/max (the only action — two literals per
    column, never data); each column is uniform-bucketed into
    ``2^bits`` cells and the cells interleaved. ``bits`` defaults to
    the largest value with ``bits*len(cols) <= 48`` (capped 16) —
    cell granularity beyond file count buys nothing.

    ``bucket_mode='quantile'``: equal-FREQUENCY cells from
    ``approxQuantile`` boundaries (one sketch pass, driver gets
    ``2^bits - 1`` literals per column). Use when a clustering column
    is heavily skewed — uniform cells then collapse most rows into one
    bucket and the layout stops pruning on the OTHER columns; quantile
    cells keep every z-range population-balanced. ``bits`` defaults
    to 6 here (63 comparisons/column/row is the codegen budget; cell
    count beyond file count still buys nothing).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bucket_mode not in ("uniform", "quantile"):
        raise ValueError(f"unknown bucket_mode '{bucket_mode}'")
    if bits is None:
        bits = min(16, 48 // len(cols)) if bucket_mode == "uniform" else 6
    from pyspark.sql.types import (
        DateType, NumericType, TimestampNTZType, TimestampType,
    )

    # timestamps cast to double as epoch seconds; DATE cannot cast to
    # numeric, so it becomes days-since-epoch explicitly. Reject other
    # types up front — cast("double") would turn e.g. a string column
    # into all-NULL and silently degrade the layout.
    numeric = {}
    for c in cols:
        dtype = df.schema[c].dataType
        if isinstance(dtype, DateType):
            numeric[c] = F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        elif isinstance(dtype, (NumericType, TimestampType, TimestampNTZType)):
            numeric[c] = F.col(c).cast("double")
        else:
            raise ValueError(
                f"zorder_key column '{c}' has non-orderable-numeric type "
                f"{dtype.simpleString()}; cast or bucketize it first"
            )
    if bucket_mode == "quantile":
        n_cells = 1 << bits
        probs = [i / n_cells for i in range(1, n_cells)]
        proj = df.select(
            *[numeric[c].alias(f"__q_{i}") for i, c in enumerate(cols)]
        )
        all_bounds = proj.stat.approxQuantile(
            [f"__q_{i}" for i in range(len(cols))], probs, 0.001
        )
        buckets = [
            quantile_bucket(numeric[c], sorted(set(bs or [])))
            for c, bs in zip(cols, all_bounds)
        ]
        return df.withColumn(key_col, interleave_bits(buckets, bits))
    stats = df.agg(
        *[F.min(numeric[c]).alias(f"__lo_{c}") for c in cols],
        *[F.max(numeric[c]).alias(f"__hi_{c}") for c in cols],
    ).collect()[0]
    buckets = []
    for c in cols:
        lo, hi = stats[f"__lo_{c}"], stats[f"__hi_{c}"]
        if lo is None or hi is None:
            # empty input or all-NULL column: constant bucket (the
            # layout degrades to a no-op instead of crashing the write)
            lo = hi = 0.0
        buckets.append(uniform_bucket(numeric[c], lo, hi, 1 << bits))
    return df.withColumn(key_col, interleave_bits(buckets, bits))


def morton_layout(
    df: DataFrame,
    cols: list[str],
    *,
    n_files: int,
    bits: int | None = None,
    lead_cols: list[str] | None = None,
) -> DataFrame:
    """Return ``df`` physically arranged in Z-order over ``cols``:
    range-partitioned into ``n_files`` contiguous Morton-key ranges and
    sorted by the key within each, key dropped. The single shared
    layout recipe behind :func:`write_zordered` and
    ``write_sink(zorder_by=...)``.

    ``lead_cols`` (e.g. the write's ``partition_by`` columns) prefix
    both the range partitioning and the sort, giving Z-order WITHIN
    each value-partition — Delta's OPTIMIZE ZORDER semantics on a
    partitioned table: each hive partition directory's files hold
    contiguous Morton ranges instead of a global interleave sliced
    arbitrarily across partitions."""
    keyed = zorder_key(df, cols, bits=bits, key_col="__z")
    order = [F.asc(c) for c in (lead_cols or [])] + [F.asc("__z")]
    return (
        keyed.repartitionByRange(int(n_files), *order)
        .sortWithinPartitions(*order)
        .drop("__z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int,
    bits: int | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> None:
    """Write ``df`` laid out in Z-order over ``cols``: range-partition
    on the Morton key into ``n_files`` contiguous key ranges, sort each
    partition by it, drop the key, write one file per range. Any
    reader filtering on ANY of ``cols`` then skips most files/row
    groups via parquet min/max stats — multi-dimensional pruning from
    a plain parquet table. The write costs one range shuffle (with its
    sampling pass) + local sorts, the same bill Delta's OPTIMIZE
    ZORDER pays."""
    w = (
        morton_layout(df, cols, n_files=n_files, bits=bits)
        .write.mode(mode)
        .format(format)
    )
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save(path)


@transform("zorder_key")
def zorder_key_transform(
    ctx: EngineContext, *, columns: list[str], bits: int | None = None,
    output_column: str = "z_key", bucket_mode: str = "uniform",
) -> EngineContext:
    """YAML surface: add a Morton clustering key (uniform or
    quantile-balanced cells)."""
    return ctx.with_df(
        zorder_key(
            ctx.df, columns, bits=bits, key_col=output_column,
            bucket_mode=bucket_mode,
        )
    )


def rowgroups_matching(path_glob: str, column: str, value) -> tuple[int, int]:
    """(matching, total) parquet row groups whose footer [min, max]
    stats admit ``value`` on ``column`` — the data-skipping yardstick
    used by the layout tests and the bench zorder probe (one shared
    implementation so their unprunable-stats semantics cannot drift).
    A row group without stats counts as touched (a reader must scan
    it)."""
    import glob

    import pyarrow.parquet as pq

    match = total = 0
    for f in glob.glob(path_glob):
        pf = pq.ParquetFile(f)
        names = {n: i for i, n in enumerate(pf.schema_arrow.names)}
        ci = names[column]
        for rg in range(pf.num_row_groups):
            st = pf.metadata.row_group(rg).column(ci).statistics
            total += 1
            if st is None or st.min is None:
                match += 1
            elif st.min <= value <= st.max:
                match += 1
    return match, total
