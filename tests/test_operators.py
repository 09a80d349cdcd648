"""Unit tests for the composed operator library (upserts, SCD2 edges,
multimodal decode, inference semantics) on tiny in-memory frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.operators.inference import with_sentiment
from etl_pipeline_mini_project_01_spark.operators.multimodal import decode_features
from etl_pipeline_mini_project_01_spark.operators.scd import (
    idempotent_append,
    scd2_initial,
    scd2_merge,
    upsert_latest,
)


def test_idempotent_append_first_wins(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    incoming = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    out = {(r.k, r.v) for r in idempotent_append(existing, incoming, "k").collect()}
    assert out == {(1, "a"), (2, "b"), (3, "c")}


def test_upsert_latest_keeps_newest_version(spark):
    existing = spark.createDataFrame([(1, "old", 1), (2, "keep", 5)],
                                     "k int, v string, ver int")
    incoming = spark.createDataFrame([(1, "new", 2), (2, "stale", 4)],
                                     "k int, v string, ver int")
    out = {(r.k, r.v) for r in
           upsert_latest(existing, incoming, "k", ["ver"]).collect()}
    assert out == {(1, "new"), (2, "keep")}


def test_scd2_null_transition_not_detected(spark):
    """Documented reference semantics (silver_etl.py:192-195): NULL <->
    value transitions are invisible to plain <> comparison."""
    snap1 = spark.createDataFrame([(1, None), (2, "x")], "k int, attr string")
    snap2 = spark.createDataFrame([(1, "now-set"), (2, "x")], "k int, attr string")
    dim = scd2_initial(snap1, "2024-01-01 00:00:00")
    merged = scd2_merge(dim, snap2, "k", ["attr"], "2024-01-15 00:00:00")
    # key 1 changed NULL->value but plain <> returns UNKNOWN -> not expired
    rows = merged.filter(F.col("k") == 1).collect()
    assert len(rows) == 1 and rows[0]["attr"] is None
    # null_safe mode detects it
    merged_ns = scd2_merge(dim, snap2, "k", ["attr"], "2024-01-15 00:00:00",
                           null_safe=True)
    assert merged_ns.filter(F.col("k") == 1).count() == 2


def test_multimodal_decode_deterministic(spark):
    df = spark.createDataFrame([(1, bytearray(b"abc"))],
                               "doc_id long, payload binary")
    row = decode_features(df).collect()[0]
    assert row.n_bytes == 3
    assert row.checksum == "900150983cd24fb0d6963f7d28e17f72"  # md5('abc')
    assert sum(row.byte_histogram) == 3


def test_multimodal_real_codec_stubbed(spark):
    import pytest

    df = spark.createDataFrame([(1, bytearray(b"x"))],
                               "doc_id long, payload binary")
    with pytest.raises(NotImplementedError):
        decode_features(df, codec="jpeg")


def test_sentiment_threshold_semantics(spark):
    df = spark.createDataFrame(
        [(1, "fast good win"),        # all positive -> confident Positive
         (2, "slow bad fail error"),  # all negative -> confident Negative
         (3, "fast slow"),            # 50/50 -> below threshold -> Neutral
         (4, "table chair lamp")],    # no lexicon hits -> Neutral
        "doc_id long, text string")
    out = {r.doc_id: (r.sentiment_value, r.sentiment_score)
           for r in df.select("doc_id", *with_sentiment("text")).collect()}
    assert out[1] == ("Positive", 1.0)
    assert out[2] == ("Negative", 1.0)
    assert out[3] == ("Neutral", 0.5)
    assert out[4] == ("Neutral", 0.5)


def test_sentiment_distribution_equals_aggregated_udf(spark):
    """Coherence: u2_sentiment_distribution (pure column expressions)
    must equal the per-row pandas_udf surface aggregated - proving the
    two inference surfaces implement one lexicon."""
    from etl_pipeline_mini_project_01_spark.plans.registry import (
        QUERIES,
        load_all_plans,
    )
    load_all_plans()
    sf = "/root/testdata/sf0.001"
    # The r11 composite emits one row per (doc, token<=3): collapse to
    # doc grain first - sentiment is constant per doc_id by construction.
    from_udf = {
        (r.sentiment_value, r.n)
        for r in QUERIES["u2_sentiment_inference"](spark, sf)
        .select("doc_id", "sentiment_value").distinct()
        .groupBy("sentiment_value").agg(F.count(F.lit(1)).alias("n"))
        .collect()}
    from_sql = {(r.sentiment_value, r.n)
                for r in QUERIES["u2_sentiment_distribution"](spark, sf)
                .collect()}
    assert from_udf == from_sql


def test_approx_distinct_within_tolerance(spark):
    from etl_pipeline_mini_project_01_spark.plans.registry import (
        QUERIES,
        load_all_plans,
    )
    load_all_plans()
    rows = QUERIES["a11_approx_distinct"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    # The registered surface emits the verdict itself (oracle = literal
    # TRUE), so the accuracy contract must hold on every row.
    for r in rows:
        assert r.within_2pct, (r.event_type, r.exact_users)


def test_resize_images_plumbing(spark):
    """Resize plumbing: fixed-size pixel buffers, deterministic fake
    codec, Arrow-batched; real codecs env-gate cleanly."""
    import pytest

    from etl_pipeline_mini_project_01_spark.operators.multimodal import (
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, b"abcdefghij" * 20), (2, b""), (3, b"x")],
        ["doc_id", "payload"])
    out = {r["doc_id"]: r for r in
           resize_images(df, 4, 4).collect()}
    assert all(len(out[i]["pixels"]) == 16 for i in (1, 2, 3))
    assert out[1]["width"] == 4 and out[1]["height"] == 4
    assert out[3]["pixels"] == b"x" * 16  # nearest-neighbor of 1 byte
    # deterministic across runs
    again = {r["doc_id"]: bytes(r["pixels"])
             for r in resize_images(df, 4, 4).collect()}
    assert again == {k: bytes(v["pixels"]) for k, v in out.items()}

    with pytest.raises(NotImplementedError):
        resize_images(df, 4, 4, codec="pil").collect()


def test_idempotent_append_dedups_within_one_batch(spark):
    """ON CONFLICT DO NOTHING must also hold WITHIN one incoming batch
    (a retried extract ships a key twice; Postgres inserts one row) -
    first-wins is made deterministic by the lowest remaining-column
    tuple per key."""
    existing = spark.createDataFrame([(1, "a")], "k bigint, v string")
    incoming = spark.createDataFrame(
        [(2, "z"), (2, "b"), (1, "x")], "k bigint, v string")
    out = sorted((r.k, r.v) for r in
                 idempotent_append(existing, incoming, "k").collect())
    assert out == [(1, "a"), (2, "b")]      # one row per key; lowest v


def test_asof_null_payload_not_resurrected(spark):
    """The matched right row is attached ATOMICALLY: a NULL payload
    value in the latest matching row stays NULL (per-column carry used
    to resurrect a staler row's value and mix columns across rows),
    and a right row with NULL ts never matches (left.ts >= NULL is
    never true)."""
    from etl_pipeline_mini_project_01_spark.operators.asof import (
        asof_join_backward,
    )

    right = spark.createDataFrame(
        [(1, 1.0, "a", "y"), (1, 2.0, None, "x"), (2, None, "n", "n")],
        "k bigint, ts double, p1 string, p2 string")
    left = spark.createDataFrame(
        [(1, 3.0), (2, 5.0)], "k bigint, ts double")
    out = {r.k: (r.p1, r.p2) for r in
           asof_join_backward(left, right, "k", "ts", "ts",
                              ["p1", "p2"]).collect()}
    # k=1: the ts=2 row wins atomically - p1 NULL, p2 'x' (NOT p1='a')
    assert out[1] == (None, "x")
    # k=2: the only right row has NULL ts - no match
    assert out[2] == (None, None)


def test_bucketed_range_join_left_keeps_unmatched(spark):
    """The exact range predicate rides inside the join condition, so a
    LEFT join keeps points that match no interval (a post-join filter
    dropped every null-extended row - all non-inner modes silently
    degenerated to inner)."""
    from etl_pipeline_mini_project_01_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    points = spark.createDataFrame([(1, 5.0), (2, 50.0)],
                                   "pid bigint, x double")
    intervals = spark.createDataFrame([(10, 0.0, 10.0)],
                                      "iid bigint, lo double, hi double")
    out = {r.pid: r.iid for r in
           bucketed_range_join(points, "x", intervals, "lo", "hi",
                               stride=10.0, how="left").collect()}
    assert out == {1: 10, 2: None}           # unmatched point survives


def test_salted_aggregate_salts_per_row_not_per_key(spark):
    """The salt must vary WITHIN a key or the hot key still lands in
    one partial group and the two-phase rewrite does nothing. The salt
    source is the input partition id (per-row, map-local partials);
    pinned via the analyzed plan, plus exactness on a one-hot-key
    input spread over many partitions."""
    from etl_pipeline_mini_project_01_spark.operators.skew import (
        salted_sum_count,
    )

    one_key = (spark.range(0, 10000, 1, 16)
               .select(F.lit("hot").alias("k"),
                       (F.col("id") % 7).cast("double").alias("v")))
    out = salted_sum_count(one_key, "k", "v", salt_buckets=8)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "SPARK_PARTITION_ID" in plan.upper()
    row = out.collect()[0]
    truth = one_key.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,4)")).cast("double")
        .alias("total")).collect()[0]
    assert (row.n, row.total) == (truth.n, truth.total)


def test_bucketed_range_join_rejects_unknown_modes(spark):
    """Unknown mode strings (cross, typos, and the bogus
    "left_anti_join" spelling an r11 ADVICE note caught in the
    accept-list) fail with this operator's loud ValueError, never a
    confusing Catalyst IllegalArgumentException; every Spark spelling
    of every real mode stays accepted."""
    import pytest

    from etl_pipeline_mini_project_01_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    points = spark.createDataFrame([(1, 5.0)], "pid bigint, x double")
    intervals = spark.createDataFrame([(10, 0.0, 10.0)],
                                      "iid bigint, lo double, hi double")
    for bad in ("cross", "left_anti_join", "lefty", ""):
        with pytest.raises(ValueError, match="not a Spark join mode"):
            bucketed_range_join(points, "x", intervals, "lo", "hi",
                                stride=10.0, how=bad)
    for ok in ("inner", "left", "left_outer", "leftsemi", "left_anti",
               "right", "right_outer", "full", "full_outer", "outer"):
        df = bucketed_range_join(points, "x", intervals, "lo", "hi",
                                 stride=10.0, how=ok)
        assert df.count() in (0, 1)   # semantics pinned elsewhere


def test_bucketed_range_join_outer_modes_one_row_per_interval(spark):
    """VERDICT r11 #2: right/full modes. The killer case is an
    unmatched interval spanning MANY buckets - the naive rewrite would
    null-extend every exploded copy (here 10 of them); the row-id
    core+remainder must emit exactly one. Checked against the naive
    theta-join truth for both modes, plus the matched-path-identical
    guarantee vs the inner core."""
    from etl_pipeline_mini_project_01_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 200.0)], "pid bigint, x double")
    intervals = spark.createDataFrame(
        [(10, 0.0, 10.0),      # matches pid 1
         (11, 10.0, 20.0),     # matches pid 2
         (12, 50.0, 150.0),    # unmatched, spans 10 stride-10 buckets
         (13, 14.0, 16.0)],    # matches pid 2 too (overlapping band)
        "iid bigint, lo double, hi double")

    def pairs(rows):
        # None sorts don't compose in py3; map None -> -1 (ids are >= 0)
        return sorted(((-1 if r.pid is None else r.pid),
                       (-1 if r.iid is None else r.iid)) for r in rows)

    right = bucketed_range_join(points, "x", intervals, "lo", "hi",
                                stride=10.0, how="right").collect()
    assert pairs(right) == [(-1, 12), (1, 10), (2, 11), (2, 13)]

    full = bucketed_range_join(points, "x", intervals, "lo", "hi",
                               stride=10.0, how="full").collect()
    assert pairs(full) == [(-1, 12), (1, 10), (2, 11), (2, 13),
                           (3, -1)]

    inner = bucketed_range_join(points, "x", intervals, "lo", "hi",
                                stride=10.0, how="inner").collect()
    matched = sorted((r.pid, r.iid, r.x, r.lo, r.hi) for r in inner)
    for rows in (right, full):
        assert sorted((r.pid, r.iid, r.x, r.lo, r.hi) for r in rows
                      if r.pid is not None and r.iid is not None
                      ) == matched


def test_idempotent_append_nonnullable_key_skips_null_split(spark):
    """VERDICT r11 #5: when the key column is non-nullable by schema,
    the NULL split + trailing union never enters the plan (the pre-r11
    shape) - pinned on the analyzed plan, plus result equality with
    the nullable-schema path on the same NULL-free data."""
    from etl_pipeline_mini_project_01_spark.operators.scd import (
        idempotent_append,
    )

    # spark.range ids are non-nullable
    existing = spark.range(3).select(F.col("id").alias("k"),
                                     F.lit("e").alias("v"))
    incoming = spark.range(2, 6).select(F.col("id").alias("k"),
                                        F.lit("i").alias("v"))
    assert not incoming.schema["k"].nullable
    out = idempotent_append(existing, incoming, "k")
    plan = out._jdf.queryExecution().analyzed().toString().lower()
    assert "isnull" not in plan          # no NULL branch in the plan
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [(0, "e"), (1, "e"), (2, "e"),
                   (3, "i"), (4, "i"), (5, "i")]


def test_idempotent_append_null_keys_never_conflict(spark):
    """Postgres unique indexes treat NULLs as distinct - ON CONFLICT
    DO NOTHING fires for none of them, so every NULL-key incoming row
    appends (the per-key dedup window used to group them and keep
    one)."""
    existing = spark.createDataFrame([(1, "a")], "k int, v string")
    incoming = spark.createDataFrame(
        [(None, "n1"), (None, "n2"), (1, "x"), (2, "b")],
        "k int, v string")
    rows = [(r.k, r.v) for r in
            idempotent_append(existing, incoming, "k").collect()]
    out = sorted(rows, key=lambda t: (t[0] is None, t))
    assert out == [(1, "a"), (2, "b"), (None, "n1"), (None, "n2")]


def test_upsert_latest_incoming_wins_version_ties(spark):
    """Postgres ON CONFLICT DO UPDATE overwrites unconditionally: when
    existing and incoming carry the SAME version for a key, the
    incoming row must win deterministically (ordering by version alone
    left it to partition-order luck)."""
    existing = spark.createDataFrame([(1, "old", 5), (2, "keep", 7)],
                                     "k int, v string, ver int")
    incoming = spark.createDataFrame([(1, "new", 5), (2, "stale", 6)],
                                     "k int, v string, ver int")
    out = {(r.k, r.v) for r in
           upsert_latest(existing, incoming, "k", ["ver"]).collect()}
    assert out == {(1, "new"), (2, "keep")}


def test_scd_operators_reject_reserved_artifact_columns(spark):
    """r13 sweep: an incoming frame already carrying __rn/__src would
    be overwritten in the window tag and silently dropped from the
    result - loud ValueError instead (the rangejoin reserved-name
    contract, applied to the scd family)."""
    import pytest
    from pyspark.sql import functions as F

    from etl_pipeline_mini_project_01_spark.operators.scd import (
        idempotent_append,
        upsert_latest,
    )

    base = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="__rn.*reserved|reserved.*__rn"):
        idempotent_append(base, base.withColumn("__rn", F.lit(1)), "k")
    with pytest.raises(ValueError, match="reserved"):
        upsert_latest(base.withColumn("__src", F.lit(9)),
                      base.withColumn("__src", F.lit(9)), "k", ["v"])


def test_upsert_latest_guards_existing_side_too(spark):
    """r13 review: the reserved-name guard must cover the EXISTING
    frame as well - existing.withColumn('__src', 0) would silently
    destroy a caller's __src column and drop it from the result."""
    import pytest
    from pyspark.sql import functions as F

    from etl_pipeline_mini_project_01_spark.operators.scd import (
        upsert_latest,
    )

    inc = spark.createDataFrame([(1, "a", 2)], "k int, v string, ver int")
    bad_existing = inc.withColumn("__src", F.lit(9))
    with pytest.raises(ValueError, match="reserved"):
        upsert_latest(bad_existing, inc.withColumn("__src", F.lit(9))
                      .drop("__src"), "k", ["ver"])
