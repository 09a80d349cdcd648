"""Property tests: the composed as-of and bucketed-range joins must
equal their naive (obviously-correct, unscalable) formulations on
randomized inputs - hypothesis drives the data, Spark runs both."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.operators.asof import (
    asof_join_backward,
)
from etl_pipeline_mini_project_01_spark.operators.rangejoin import (
    bucketed_range_join,
)

_EPOCH = datetime.datetime(2024, 1, 1)

_asof_data = st.tuples(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 1000)),
             min_size=1, max_size=25),   # left: (key, minutes)
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 1000),
                       st.integers(-100, 100)),
             min_size=0, max_size=25),   # right: (key, minutes, payload)
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_asof_data)
def test_asof_equals_naive_latest_prior(spark, data):
    lrows, rrows = data
    left = spark.createDataFrame(
        [(i, k, _EPOCH + datetime.timedelta(minutes=m))
         for i, (k, m) in enumerate(lrows)], ["event_id", "k", "ts"])
    # unique (key, ts) on the right - the operator's documented contract
    seen, rdedup = set(), []
    for k, m, p in rrows:
        if (k, m) not in seen:
            seen.add((k, m))
            rdedup.append((k, _EPOCH + datetime.timedelta(minutes=m), p))
    right = spark.createDataFrame(rdedup or [(99, _EPOCH, 0)],
                                  ["k", "rts", "payload"])

    got = {r["event_id"]: r["payload"]
           for r in asof_join_backward(left, right, "k", "ts", "rts",
                                       ["payload"]).collect()}

    rlocal = {}
    for k, rts, p in (rdedup or []):
        rlocal.setdefault(k, []).append((rts, p))
    expect = {}
    for i, (k, m) in enumerate(lrows):
        ts = _EPOCH + datetime.timedelta(minutes=m)
        prior = [(rts, p) for rts, p in rlocal.get(k, []) if rts <= ts]
        expect[i] = max(prior)[1] if prior else None
    assert got == expect


_range_data = st.tuples(
    st.lists(st.floats(0, 100, allow_nan=False), min_size=1, max_size=30),
    st.lists(st.tuples(st.floats(0, 100, allow_nan=False),
                       st.floats(0.1, 15)), min_size=1, max_size=15),
    st.floats(0.5, 20),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_range_data)
def test_bucketed_range_join_equals_naive_theta(spark, data):
    pts, ivs, stride = data
    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(pts)], ["pid", "x"])
    intervals = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(ivs)],
        ["iid", "lo", "hi"])

    got = {(r["pid"], r["iid"]) for r in bucketed_range_join(
        points, "x", intervals, "lo", "hi", stride).collect()}
    naive = {(r["pid"], r["iid"]) for r in points.join(
        intervals, (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
        .collect()}
    assert got == naive


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_range_data)
def test_bucketed_range_join_outer_modes_equal_naive(spark, data):
    """right/full bucketed range joins vs Spark's native BNLJ outer
    theta join, compared as MULTISETS - the naive rewrite's failure
    mode is an unmatched interval null-extended once per exploded
    bucket copy, which only a duplicate-sensitive compare catches."""
    from collections import Counter

    pts, ivs, stride = data
    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(pts)], ["pid", "x"])
    intervals = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(ivs)],
        ["iid", "lo", "hi"])
    cond = (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    for mode in ("right", "full"):
        got = Counter((r["pid"], r["iid"]) for r in bucketed_range_join(
            points, "x", intervals, "lo", "hi", stride,
            how=mode).collect())
        naive = Counter((r["pid"], r["iid"]) for r in
                        points.join(intervals, cond, mode).collect())
        assert got == naive, mode


def test_bucketed_range_join_hi_barely_past_boundary(spark):
    """Pinned hypothesis counterexample: hi = 1 + ulp(1) sits barely
    past the bucket boundary, so the old `hi - 1e-12` epsilon (larger
    than ulp here) under-shot the last bucket and dropped the matching
    point x = 1.0. The inclusive-hi explode must keep it."""
    eps = 2.220446049250313e-16
    points = spark.createDataFrame([(0, 1.0)], ["pid", "x"])
    intervals = spark.createDataFrame([(0, eps, 1.0 + eps)],
                                      ["iid", "lo", "hi"])
    got = {(r["pid"], r["iid"]) for r in bucketed_range_join(
        points, "x", intervals, "lo", "hi", 1.0).collect()}
    assert got == {(0, 0)}


def test_outer_range_join_nondeterministic_intervals_plan(spark):
    """VERDICT r12 #5: the right/full remainder must not ride on
    positional row ids. The intervals side here is a round-robin
    repartition (Spark plans it nondeterministic: row->partition
    assignment may differ between the core and remainder evaluations)
    and carries EXACT DUPLICATE rows - the case where an id scheme that
    is not a pure function of row content double-counts or drops
    unmatched intervals. Compared as multisets vs the native outer
    theta join."""
    from collections import Counter

    points = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], ["pid", "x"])
    base = [
        # matched band, duplicated twice: both copies must join
        (1, 0.5, 2.5), (1, 0.5, 2.5),
        # unmatched band, duplicated three times: exactly three
        # null-extended remainder rows, not 0/2/6
        (2, 50.0, 60.0), (2, 50.0, 60.0), (2, 50.0, 60.0),
        (3, 4.5, 5.5),                      # matched once
    ]
    intervals = (spark.createDataFrame(base, ["iid", "lo", "hi"])
                 .repartition(7))           # round-robin: nondeterministic
    cond = (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    naive_src = spark.createDataFrame(base, ["iid", "lo", "hi"])
    for mode in ("right", "full"):
        got = Counter(
            (r["pid"], r["iid"]) for r in bucketed_range_join(
                points, "x", intervals, "lo", "hi", 2.0,
                how=mode).collect())
        naive = Counter(
            (r["pid"], r["iid"]) for r in
            points.join(naive_src, cond, mode).collect())
        assert got == naive, mode
        assert got[(None, 2)] == 3, mode    # the triplicated remainder


def test_range_join_rejects_reserved_columns(spark):
    """ADVICE r12: a caller column named after an internal artifact
    (__iv_h/__iv_n/__bucket_*) would be silently overwritten and then
    dropped from the result - must be a loud ValueError instead."""
    import pytest

    points = spark.createDataFrame([(1, 1.0)], ["pid", "x"])
    intervals = spark.createDataFrame([(1, 0.0, 2.0)],
                                      ["iid", "lo", "hi"])
    for col, side in (("__iv_h", "intervals"), ("__bucket_i", "intervals"),
                      ("__bucket_p", "points"), ("__iv_n", "points")):
        bad_p = points.withColumn(col, F.lit(0)) if side == "points" else points
        bad_i = (intervals.withColumn(col, F.lit(0))
                 if side == "intervals" else intervals)
        with pytest.raises(ValueError, match="reserved"):
            bucketed_range_join(bad_p, "x", bad_i, "lo", "hi", 2.0,
                                how="full")


def test_outer_range_join_null_pattern_rows_get_distinct_ids(spark):
    """r13 review: Spark's hash functions SKIP null arguments, so
    (1, 2.0, NULL, 5.0) and (1, 2.0, 5.0, NULL) hash the same value
    sequence - without null-pattern flags both content hashes collide
    and the remainder tie-breaks nondeterministically. The full-outer
    result must stay a correct multiset with such rows present, and
    the two rows' content hashes must actually differ."""
    from collections import Counter

    points = spark.createDataFrame([(0, 1.0)], ["pid", "x"])
    base = [
        # same non-null value sequence, different null pattern:
        # A has hi=5.0 (matches x=1.0), B has hi=NULL (matches nothing)
        (1, 0.0, 5.0, None),
        (1, 0.0, None, 5.0),
    ]
    intervals = (spark.createDataFrame(
        base, "iid int, lo double, hi double, tag double")
        .repartition(5))
    cond = (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    naive_src = spark.createDataFrame(
        base, "iid int, lo double, hi double, tag double")
    got = Counter(
        (r["pid"], r["iid"], r["hi"], r["tag"]) for r in
        bucketed_range_join(points, "x", intervals, "lo", "hi", 2.0,
                            how="full").collect())
    naive = Counter(
        (r["pid"], r["iid"], r["hi"], r["tag"]) for r in
        points.join(naive_src, cond, "full").collect())
    assert got == naive
    # the id hashes themselves must distinguish the null patterns
    flags = [F.col(c).isNull() for c in naive_src.columns]
    hs = [r["h"] for r in naive_src.select(
        F.xxhash64(*[F.col(c) for c in naive_src.columns], *flags)
        .alias("h")).collect()]
    assert hs[0] != hs[1]
