"""Range-bucketed interval join (SCALE.md TODO closed in round 2).

The 4-row score-band join (J3) is fine as a BroadcastNestedLoopJoin -
O(rows x 4). With a LARGE interval dimension (10^5+ bands) BNLJ is
O(rows x bands): the scalable rewrite buckets both sides by a fixed
stride so the join becomes an equi-join on bucket id:

  * each point maps to bucket floor(x / stride) - one row;
  * each interval [lo, hi) explodes to every bucket it overlaps
    (~width/stride rows, bounded when stride >= typical width);
  * equi-join on bucket, then the exact `lo <= x < hi` filter.

Shuffle-partitionable by bucket, never a cross join. This is the same
trick Spark's own storage-partitioned range joins and interval libraries
use; here it is a reusable operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Internal artifact columns. Callers may not use these names: the
#: bucket columns would be overwritten inside the join, and the id
#: columns would be tagged over ambiguously and then silently dropped
#: from the result by the outer-mode cleanup (ADVICE r12) - so presence
#: of any of them is a loud error, mirroring the disjoint-column-names
#: contract in the docstring.
_RESERVED = ("__bucket_p", "__bucket_i", "__iv_h", "__iv_n")


def _check_reserved(df: DataFrame, side: str) -> None:
    clash = [c for c in df.columns if c in _RESERVED]
    if clash:
        raise ValueError(
            f"bucketed_range_join: {side} frame already has internal "
            f"artifact column(s) {clash}; rename them - "
            f"{_RESERVED} are reserved by this operator")


#: Modes that preserve only the POINTS side. Points carry exactly one
#: bucket each, so these pass straight through the bucketed equi-join:
#: a (point, interval) pair can only meet in the point's single bucket,
#: hence no mode here ever duplicates a point row. (Spark's accepted
#: spellings only - an r11 ADVICE note caught a bogus "left_anti_join"
#: entry that let the unknown string through to a confusing Catalyst
#: error instead of this operator's loud ValueError.)
_LEFT_PRESERVING = frozenset({
    "inner", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti",
})

#: Interval-preserving modes. The intervals side is bucket-exploded
#: (one row per overlapped bucket), so a naive right/full join would
#: null-extend EVERY exploded copy of an unmatched interval - one
#: spurious row per bucket it spans. These modes therefore run as
#: core-join + remainder: tag each interval with a row id BEFORE the
#: explode, join left-preserving, then union the intervals whose id
#: never matched, null-extended on the point columns (VERDICT r11 #2).
_RIGHT_MODES = frozenset({"right", "rightouter", "right_outer"})
_FULL_MODES = frozenset({"full", "fullouter", "full_outer", "outer"})


def bucketed_range_join(points: DataFrame, point_col: str,
                        intervals: DataFrame, lo_col: str, hi_col: str,
                        stride: float,
                        how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with lo <= point < hi,
    via stride-bucketing. `points` and `intervals` must have disjoint
    column names apart from the join artifacts. Intervals wider than
    many strides explode proportionally - pick stride near the typical
    interval width.

    All of Spark's join modes are supported. Left-preserving modes
    (inner / left / left_semi / left_anti) pass straight through the
    bucketed equi-join: each point has exactly one bucket, so no pair
    can match twice. Interval-preserving modes (right / full) run as
    core-join + remainder: intervals are tagged with a row id before
    the bucket explode, the core joins left-preserving, and intervals
    whose id never matched are unioned back null-extended on the point
    columns - so each unmatched interval appears exactly ONCE, not once
    per exploded bucket copy. The matched-pair rows are produced by the
    identical inner core in every mode. The row id is content-derived,
    so right/full stay correct even when the `intervals` plan
    re-evaluates nondeterministically (round-robin repartition, AQE
    re-shuffles, task retries) - only the row MULTISET must be stable,
    which any plan short of sample()/limit() guarantees."""
    mode = how.lower().replace(" ", "")
    _check_reserved(points, "points")
    _check_reserved(intervals, "intervals")
    if mode in _RIGHT_MODES or mode in _FULL_MODES:
        return _interval_preserving_join(
            points, point_col, intervals, lo_col, hi_col, stride,
            full=mode in _FULL_MODES)
    if mode not in _LEFT_PRESERVING:
        raise ValueError(
            f"bucketed_range_join: how={how!r} is not a Spark join "
            "mode this operator recognises (inner/left/semi/anti/"
            "right/full and their spelled-out variants)")
    return _bucketed_core(points, point_col, intervals, lo_col, hi_col,
                          stride, mode)


def _bucketed_core(points: DataFrame, point_col: str,
                   intervals: DataFrame, lo_col: str, hi_col: str,
                   stride: float, mode: str) -> DataFrame:
    """The left-preserving bucketed equi-join, sans validation - shared
    by the public entry and the outer-mode path (whose intervals side
    legitimately carries the internal __iv_* id columns)."""
    p = points.withColumn(
        "__bucket_p", F.floor(F.col(point_col) / F.lit(stride)).cast("bigint"))
    iv = intervals.withColumn(
        "__bucket_i",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / F.lit(stride)).cast("bigint"),
            # hi is exclusive, but the last candidate bucket is taken
            # INCLUSIVE of hi's own bucket: a "largest value strictly
            # below hi" epsilon (the first version subtracted 1e-12)
            # under-shoots whenever ulp(hi) < epsilon - e.g. hi barely
            # above a bucket boundary - and silently drops the last
            # bucket (hypothesis-found: point 1.0 vs [2.2e-16, 1+2.2e-16)).
            # The cost is at most ONE spurious candidate bucket per
            # interval, and the exact lo<=x<hi filter removes any false
            # pairs - correctness never rides on float epsilons.
            F.floor(F.col(hi_col) / F.lit(stride)).cast("bigint"))))
    # The exact range predicate rides INSIDE the join condition, not a
    # post-join filter: a filter after a left/outer join would evaluate
    # NULL on every null-extended row and silently drop it - any
    # non-inner `how` degenerated to inner. Catalyst still extracts the
    # bucket equality as the equi-join key; the range check runs as the
    # join's residual condition.
    cond = ((F.col("__bucket_p") == F.col("__bucket_i"))
            & (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col)))
    joined = p.join(iv, cond, mode)
    return joined.drop("__bucket_p", "__bucket_i")


def _interval_preserving_join(points: DataFrame, point_col: str,
                              intervals: DataFrame, lo_col: str,
                              hi_col: str, stride: float,
                              full: bool) -> DataFrame:
    """right (full=False) / full (full=True) outer bucketed range join.

    Core = the left-preserving bucketed join (left-outer when `full`,
    so unmatched POINTS null-extend there - points are never exploded,
    so that side needs no dedup). Remainder = intervals whose row id
    appears in no matched pair, null-extended on every point column.
    The anti join runs at |intervals| granularity (the dim side) on an
    id-only projection - at 100 TB the matched-id set is dim-sized and
    broadcastable, never data-sized.

    The row id is CONTENT-DERIVED, not monotonically_increasing_id
    (ADVICE r12): the core and the remainder are two separate plan
    branches, so position-based ids silently duplicate or drop
    unmatched intervals whenever the intervals plan re-evaluates into
    a different row order (round-robin repartition, AQE re-plans, task
    retries). Id = (xxhash64 over every interval column, row_number
    within that hash group ordered by a second independent hash).
    Within a hash group, exact-duplicate rows are interchangeable - any
    numbering yields the same result multiset - and distinct colliding
    rows are ordered by the secondary hash, so the (hash, n) pair is a
    pure function of row content + duplicate index. Both branches thus
    compute the SAME id set from the same row multiset, whatever the
    physical row order. Cost: one dim-sized hash-partition shuffle per
    branch instead of the free-but-fragile partition-offset id.

    NULL-pattern flags ride in the hash input (r13 review): Spark's
    hash functions SKIP null arguments (the seed passes through), so
    (1, 2.0, NULL) and (1, NULL, 2.0) would otherwise hash the same
    sequence on BOTH algorithms and tie-break nondeterministically;
    the isNull booleans are never null, making the hashed sequence
    injective in (values, null pattern) up to true hash collisions."""
    cols = [F.col(c) for c in intervals.columns]
    flags = [F.col(c).isNull() for c in intervals.columns]
    dup_order = Window.partitionBy("__iv_h").orderBy(
        F.hash(*cols, *flags))
    iv_tagged = (intervals
                 .withColumn("__iv_h", F.xxhash64(*cols, *flags))
                 .withColumn("__iv_n", F.row_number().over(dup_order)))
    core = _bucketed_core(
        points, point_col, iv_tagged, lo_col, hi_col, stride,
        mode="left" if full else "inner")
    matched_ids = (core.select("__iv_h", "__iv_n")
                   .where(F.col("__iv_h").isNotNull())
                   .distinct())
    remainder = iv_tagged.join(
        matched_ids, ["__iv_h", "__iv_n"], "left_anti")
    null_points = remainder.select(
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in points.schema.fields],
        *[F.col(f.name) for f in intervals.schema.fields])
    return core.drop("__iv_h", "__iv_n").unionByName(null_points)
