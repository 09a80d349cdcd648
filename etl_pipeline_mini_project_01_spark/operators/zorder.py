"""Z-order (Morton) clustering: multi-column data-skipping layout.

This round's manifest add-action stats (sources/filestats.py) make a
file skippable when its [min, max] range on the PREDICATE column is
tight. A plain sort-on-write gives tight ranges on the leading sort
column only - a predicate on the second column still overlaps every
file. Interleaving the bits of k range-normalized columns into one
Morton code and range-partitioning on it bounds EVERY column's spread
per file to ~domain/P^(1/k): predicates on any clustered column (or
any conjunction) prune. This is Delta's OPTIMIZE ZORDER BY / the
classic UB-tree layout, as a format-free operator over the engine's
versioned tables.

Spark-first: the z-value is a pure JVM expression tree (shift/and/or
folds inside whole-stage codegen - no UDF), the normalization min/max
is one broadcast aggregate row, and the write is the standard
repartitionByRange + sortWithinPartitions clustered write.

Scale notes: range-normalization is LINEAR min/max scaling (map-side;
one tiny agg). Heavily skewed columns cluster better under rank
normalization, which costs a global sort per column - the standard
trade; Delta's implementation makes the same default choice
(range_partition_id approximated by sampling). Monotone-transform
first (e.g. log) when skew matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bits_per_col(k: int) -> int:
    """Interleaved code must fit a signed 64-bit long."""
    return min(16, 63 // k)


def zorder_value(cols: Sequence[str],
                 bits: int | None = None) -> Column:
    """Morton code column over `cols` (2-6 numeric/date/timestamp
    columns): each column min/max-scales to a `bits`-bit integer grid
    cell (one broadcast agg supplies the bounds), then the cells' bits
    interleave LSB-first. NULL in any column maps to cell 0 (nulls
    cluster together at the low end - they match no range predicate,
    so their placement only affects neighbors' tightness).

    The expression references `__zmin_<c>`/`__zmax_<c>` bound columns;
    use :func:`with_zorder` to attach them (kept separate so callers
    composing several z-expressions reuse one bounds join)."""
    k = len(cols)
    if not 2 <= k <= 6:
        raise ValueError(f"z-order needs 2-6 columns, got {k}")
    b = bits or _bits_per_col(k)
    if b * k > 63:
        raise ValueError(f"{b} bits x {k} cols exceeds a signed long")
    cells = []
    for c in cols:
        v = F.col(c).cast("double")
        mn = F.col(f"__zmin_{c}")
        mx = F.col(f"__zmax_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        scaled = F.floor((v - mn) / span * float((1 << b) - 1))
        cell = (F.when(v.isNull(), F.lit(0))
                .otherwise(F.greatest(F.lit(0), F.least(
                    F.lit((1 << b) - 1), scaled)))).cast("bigint")
        cells.append(cell)
    z = F.lit(0).cast("bigint")
    for i in range(b):
        for j, cell in enumerate(cells):
            z = z + F.shiftleft(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * k + j)
    return z


def with_zorder(df: DataFrame, cols: Sequence[str],
                out_col: str = "__z", bits: int | None = None
                ) -> DataFrame:
    """df + a Morton-code column: one tiny min/max aggregate broadcast
    in, the z expression evaluated map-side, helper columns dropped.
    Date/timestamp columns are normalized through their numeric cast."""
    types = dict(df.dtypes)
    missing = [c for c in cols if c not in types]
    if missing:
        raise ValueError(f"z-order columns absent from frame: {missing}")

    def _num(c: str) -> Column:
        if types[c] in ("date", "timestamp", "timestamp_ntz"):
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")

    tmp = [f"__znum_{i}" for i in range(len(cols))]
    prepped = df.withColumns({t: _num(c) for t, c in zip(tmp, cols)})
    bounds = prepped.agg(*[
        f(F.col(t)).alias(f"__z{tag}_{t}")
        for t in tmp for tag, f in (("min", F.min), ("max", F.max))])
    widened = prepped.crossJoin(F.broadcast(bounds))
    out = widened.withColumn(out_col, zorder_value(tmp, bits))
    return out.drop(*tmp,
                    *[f"__zmin_{t}" for t in tmp],
                    *[f"__zmax_{t}" for t in tmp])


def write_version_zordered(df: DataFrame, root: str,
                           zorder_by: Sequence[str],
                           num_files: int = 16,
                           stats_columns: Sequence[str] | None = None,
                           bits: int | None = None) -> int:
    """Commit df as the next version of the versioned table at `root`,
    z-order-clustered on `zorder_by` with manifest add-action stats on
    those columns (default) - the layout under which
    `read_version(prune=...)` skips files for predicates on ANY
    clustered column. Returns the committed version."""
    from ..sources.versioned import write_version

    zed = with_zorder(df, zorder_by, bits=bits)
    clustered = (zed.repartitionByRange(num_files, F.col("__z"))
                 .sortWithinPartitions("__z")
                 .drop("__z"))
    return write_version(
        clustered, root,
        stats_columns=list(stats_columns
                           if stats_columns is not None else zorder_by))
