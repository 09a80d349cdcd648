"""Streaming -> versioned-table sink (streaming/versioned_sink.py):
every micro-batch CAS-commits a new snapshot; the latest version is
batch-equivalent to the same aggregation over all input, intermediate
versions are the running state as of each batch, and the optimistic
loop rebases over a concurrent committer instead of clobbering it."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.sources.versioned import (
    latest_version,
    list_versions,
    read_version,
    write_version,
)
from etl_pipeline_mini_project_01_spark.streaming.versioned_sink import (
    commit_batch_versioned,
    run_to_versioned_sink,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def scratch():
    d = tempfile.mkdtemp(prefix="vsink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _staged_events(spark, scratch, n_files=3):
    """Stage the events table as n separate parquet files so
    maxFilesPerTrigger=1 yields n distinct micro-batches."""
    from etl_pipeline_mini_project_01_spark.catalog import load_table

    src = (load_table(spark, SF_DIR, "events")
           .select("user_id", "event_type", "value"))
    in_dir = scratch + "/in"
    (src.withColumn("_f", F.pmod(F.xxhash64("user_id"), F.lit(n_files)))
     .repartition(n_files, "_f").drop("_f")
     .write.parquet(in_dir))
    stream = (spark.readStream
              .schema("user_id bigint, event_type string, value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(in_dir))
    return src, stream


def test_versioned_sink_batch_equivalence_and_time_travel(spark, scratch):
    """Update-mode running counts through the sink: the LATEST version
    equals the batch aggregation over all input (batch equivalence);
    each intermediate version is a consistent running state (counts
    monotone per key, never a torn batch); versions are dense from 1."""
    src, stream = _staged_events(spark, scratch)
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"))
    root = scratch + "/table"
    final = run_to_versioned_sink(agg, root, scratch + "/ckpt",
                                  keys=["user_id"])

    want = {r["user_id"]: r["n"] for r in
            src.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    got = {r["user_id"]: r["n_events"] for r in final.collect()}
    assert got == want

    versions = list_versions(root)
    assert versions == list(range(1, len(versions) + 1))
    assert len(versions) >= 2          # multiple micro-batches committed
    prev: dict = {}
    for v in versions:
        state = {r["user_id"]: r["n_events"] for r in
                 read_version(spark, root, v).collect()}
        assert all(state.get(k, 0) >= n for k, n in prev.items()), v
        prev = state
    assert prev == want                # last version == final state


def test_versioned_sink_append_mode_is_batch_log(spark, scratch):
    """keys=None: each version is that batch's rows alone - the
    append-log shape; the union of versions equals the input."""
    src, stream = _staged_events(spark, scratch)
    proj = stream.select("user_id", "event_type")
    root = scratch + "/table"
    run_to_versioned_sink(proj, root, scratch + "/ckpt",
                          output_mode="append")
    rows = []
    for v in list_versions(root):
        rows += [tuple(r) for r in read_version(spark, root, v).collect()]
    assert sorted(rows) == sorted(
        tuple(r) for r in src.select("user_id", "event_type").collect())


def test_commit_rebases_over_concurrent_committer(spark, scratch):
    """The CAS loop must RE-READ the head after a conflict: a
    concurrent commit landing between batches is included in the next
    upsert's rebase, never clobbered."""
    root = scratch + "/table"
    b1 = spark.createDataFrame([(1, 10.0)], "k bigint, v double")
    assert commit_batch_versioned(b1, root, keys=["k"]) == 1
    # a concurrent writer (repair job) lands key 99
    write_version(
        read_version(spark, root).unionByName(
            spark.createDataFrame([(99, 1.0)], "k bigint, v double")),
        root)
    b2 = spark.createDataFrame([(1, 20.0), (2, 5.0)], "k bigint, v double")
    v = commit_batch_versioned(b2, root, keys=["k"])
    assert v == 3 and latest_version(root) == 3
    state = {r["k"]: r["v"] for r in read_version(spark, root).collect()}
    assert state == {1: 20.0, 2: 5.0, 99: 1.0}   # 99 survived the rebase


def test_rebase_includes_log_ahead_of_pointer(spark, scratch):
    """ADVICE r8: a writer that crashed AFTER its manifest content
    landed but BEFORE the _LATEST swap leaves the log ahead of the
    pointer with a fully-readable version. The next upsert commit must
    rebase on THAT version (its rows survive), and must not die when
    the pointer is missing entirely."""
    import os

    root = scratch + "/table"
    b1 = spark.createDataFrame([(1, 10.0)], "k bigint, v double")
    assert commit_batch_versioned(b1, root, keys=["k"]) == 1
    b2 = spark.createDataFrame([(2, 20.0)], "k bigint, v double")
    assert commit_batch_versioned(b2, root, keys=["k"]) == 2
    # simulate the crash window: v2 manifest content exists, pointer
    # regressed/missing
    os.remove(os.path.join(root, "_LATEST"))
    b3 = spark.createDataFrame([(3, 30.0)], "k bigint, v double")
    assert commit_batch_versioned(b3, root, keys=["k"]) == 3
    state = {r["k"]: r["v"] for r in read_version(spark, root, 3).collect()}
    assert state == {1: 10.0, 2: 20.0, 3: 30.0}   # v2's row survived


def test_rebase_skips_crashed_zero_byte_manifest(spark, scratch):
    """A zero-byte (claimed-never-finalized) manifest at the log head
    must not wedge the stream: the rebase walks down to the newest
    READABLE version."""
    import os

    root = scratch + "/table"
    b1 = spark.createDataFrame([(1, 10.0)], "k bigint, v double")
    assert commit_batch_versioned(b1, root, keys=["k"]) == 1
    open(os.path.join(root, "_versions", "v00000002.json"), "w").close()
    b2 = spark.createDataFrame([(2, 20.0)], "k bigint, v double")
    assert commit_batch_versioned(b2, root, keys=["k"]) == 3
    state = {r["k"]: r["v"] for r in read_version(spark, root, 3).collect()}
    assert state == {1: 10.0, 2: 20.0}            # v1 rebased over the burn


def test_empty_batch_burns_no_version(spark, scratch):
    root = scratch + "/table"
    empty = spark.createDataFrame([], "k bigint, v double")
    assert commit_batch_versioned(empty, root, keys=["k"]) is None
    assert list_versions(root) == []


def test_skip_empty_staging_leaves_no_residue(spark, scratch):
    """write_version_cas(skip_empty=True) on a zero-row frame (r14:
    the sink's empty-batch guard rides the staging write's Observation
    instead of a separate isEmpty job): no version burned, no stage
    dir or manifest left behind, and a NON-empty frame still commits
    normally through the same path."""
    import os

    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        write_version_cas,
    )

    root = scratch + "/table"
    empty = spark.createDataFrame([], "k bigint, v double")
    assert write_version_cas(empty, root, expected_version=0,
                             skip_empty=True) is None
    assert list_versions(root) == []
    residue = [e for e in os.listdir(root)
               if e.startswith("._stage_")] if os.path.isdir(root) else []
    assert residue == []

    full = spark.createDataFrame([(1, 2.0)], "k bigint, v double")
    assert write_version_cas(full, root, expected_version=0,
                             skip_empty=True) == 1
    assert read_version(spark, root).count() == 1


def test_conflict_retry_exhaustion_raises_retryable(spark, scratch,
                                                    monkeypatch):
    """When every claim loses (a pathological racer), the sink raises
    the retryable VersionConflict instead of looping forever or
    silently dropping the batch."""
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        VersionConflict,
    )
    from etl_pipeline_mini_project_01_spark.streaming import versioned_sink

    root = scratch + "/table"
    b = spark.createDataFrame([(1, 1.0)], "k bigint, v double")

    def always_loses(df, r, expected_version, manifest_extra=None,
                     skip_empty=False):
        raise VersionConflict("claimed by a concurrent committer")

    monkeypatch.setattr(versioned_sink, "write_version_cas", always_loses)
    with pytest.raises(VersionConflict, match="gave up"):
        commit_batch_versioned(b, root, keys=["k"], max_retries=3)


def test_empty_stream_returns_empty_result_not_an_error(spark, scratch):
    """A source with no rows (every micro-batch empty, or no batch at
    all) commits no version - the happy "nothing to do" run of a fresh
    pipeline. The sink must return the aggregation's empty result, not
    crash with FileNotFoundError on a phantom version 0."""
    in_dir = scratch + "/in"
    (spark.createDataFrame([], "user_id bigint, value double")
     .coalesce(1).write.parquet(in_dir))
    stream = (spark.readStream
              .schema("user_id bigint, value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(in_dir))
    agg = stream.groupBy("user_id").agg(F.sum("value").alias("total"))

    out = run_to_versioned_sink(agg, scratch + "/table",
                                scratch + "/ckpt",
                                keys=["user_id"], output_mode="update")
    assert out.count() == 0
    assert out.columns == ["user_id", "total"]
    assert list_versions(scratch + "/table") == []     # no version burned


def test_upsert_rebase_is_null_safe_on_keys(spark, scratch):
    """A NULL grouping key is a real upsert key (e.g. after a left-join
    enrichment): the rebase anti-join must match it null-safely, or the
    previous snapshot's NULL-key row survives every batch ALONGSIDE the
    re-emitted one - one duplicate per commit."""
    root = scratch + "/table"
    b1 = spark.createDataFrame([(None, 1.0), (7, 2.0)],
                               "user_id bigint, total double")
    b2 = spark.createDataFrame([(None, 5.0)],
                               "user_id bigint, total double")
    commit_batch_versioned(b1, root, keys=["user_id"])
    commit_batch_versioned(b2, root, keys=["user_id"])

    rows = sorted(((r.user_id, r.total) for r in
                   read_version(spark, root).collect()),
                  key=lambda t: (t[0] is None, t[0]))
    assert rows == [(7, 2.0), (None, 5.0)]   # exactly one NULL-key row


# ---------------------------------------------------------------------------
# Differential (merge-on-read) upsert mode - VERDICT r13 #2
# ---------------------------------------------------------------------------


def _raw_rows(spark, root, v):
    """Rows physically stored in version v's snapshot dir (no chain
    resolution) - the bytes-written measure."""
    import os
    return spark.read.parquet(os.path.join(root, f"v{v:08d}")).count()


def test_differential_bit_equal_to_rewrite_at_every_version(spark, scratch):
    """The two upsert modes are BIT-EQUAL at every version boundary:
    same visible rows for the final table AND for each intermediate
    as-of read - differential is a storage-layout change, never a
    semantics change."""
    batches = [
        [(1, 10.0), (2, 20.0)],
        [(2, 21.0), (3, 30.0)],
        [(1, 11.0), (4, 40.0), (2, 22.0)],
    ]
    roots = {"diff": scratch + "/t_diff", "full": scratch + "/t_full"}
    for mode, root in roots.items():
        for b in batches:
            commit_batch_versioned(
                spark.createDataFrame(b, "k bigint, v double"), root,
                keys=["k"], differential=(mode == "diff"))
    for v in (1, 2, 3):
        d = sorted(map(tuple, read_version(spark, roots["diff"], v).collect()))
        f = sorted(map(tuple, read_version(spark, roots["full"], v).collect()))
        assert d == f, v
    assert sorted(map(tuple, read_version(spark, roots["diff"]).collect())) \
        == [(1, 11.0), (2, 22.0), (3, 30.0), (4, 40.0)]


def test_differential_writes_scale_with_batch_not_table(spark, scratch):
    """The cleared `weak`: per-commit rows written equal |batch|, not
    |table| - the rewrite mode's cumulative-snapshot cost is gone."""
    root = scratch + "/t"
    sizes = [100, 7, 3]
    base = 0
    for i, n in enumerate(sizes):
        b = (spark.range(base, base + n)
             .select(F.col("id").alias("k"),
                     (F.col("id") * 1.0).alias("v")))
        base += n
        v = commit_batch_versioned(b, root, keys=["k"])
        assert v == i + 1
        assert _raw_rows(spark, root, v) == n           # O(|batch|)
    # the resolved table still holds every key
    assert read_version(spark, root).count() == sum(sizes)


def test_differential_compact_then_vacuum_reclaims_chain(spark, scratch):
    """compact_latest folds the chain into a full snapshot; vacuum
    keep_last=1 then reclaims every delta; reads are unchanged."""
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        compact_latest,
        vacuum_versions,
    )

    root = scratch + "/t"
    for b in ([(1, 1.0)], [(1, 2.0), (2, 5.0)], [(3, 9.0)]):
        commit_batch_versioned(
            spark.createDataFrame(b, "k bigint, v double"), root,
            keys=["k"])
    before = sorted(map(tuple, read_version(spark, root).collect()))
    cv = compact_latest(spark, root)
    assert cv == 4
    # the compacted head is a full snapshot: raw rows == table rows
    assert _raw_rows(spark, root, cv) == len(before)
    after_compact = sorted(map(tuple, read_version(spark, root).collect()))
    assert after_compact == before
    removed = vacuum_versions(root, keep_last=1, stage_retention_sec=0.0)
    assert sorted(removed) == [1, 2, 3]
    assert sorted(map(tuple, read_version(spark, root).collect())) == before
    # compacting an already-full head is a no-op returning the head
    assert compact_latest(spark, root) == cv


def test_vacuum_protects_live_delta_chain(spark, scratch):
    """keep_last would happily evict a delta chain's base - the r14
    chain closure keeps every member a promised-kept version needs, so
    merge-on-read never breaks under retention."""
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        vacuum_versions,
    )

    root = scratch + "/t"
    for b in ([(1, 1.0)], [(2, 2.0)], [(3, 3.0)], [(4, 4.0)]):
        commit_batch_versioned(
            spark.createDataFrame(b, "k bigint, v double"), root,
            keys=["k"])
    before = sorted(map(tuple, read_version(spark, root).collect()))
    # keep_last=2 keeps v3+v4, but v3's chain is v3->v2->v1: nothing
    # may be removed
    assert vacuum_versions(root, keep_last=2, stage_retention_sec=0.0) == []
    assert sorted(map(tuple, read_version(spark, root, 3).collect())) \
        == [(1, 1.0), (2, 2.0), (3, 3.0)]
    assert sorted(map(tuple, read_version(spark, root).collect())) == before


def test_differential_chain_rejects_mixed_keys(spark, scratch):
    """Commit-time fail-fast (r14 sweep: a mixed-keys delta would land
    fine and poison every subsequent read) + the read-side guard for a
    chain poisoned through the raw commit API."""
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        write_version_cas,
    )

    root = scratch + "/t"
    commit_batch_versioned(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"), root,
        keys=["k"])
    with pytest.raises(ValueError, match="do not match the live chain"):
        commit_batch_versioned(
            spark.createDataFrame([(2, 2.0)], "k bigint, v double"), root,
            keys=["k", "v"])
    write_version_cas(
        spark.createDataFrame([(2, 2.0)], "k bigint, v double"), root,
        expected_version=1,
        manifest_extra={"delta": {"keys": ["k", "v"]}})
    with pytest.raises(ValueError, match="mixes upsert keys"):
        read_version(spark, root).collect()


def test_differential_reserved_columns_guarded(spark, scratch):
    root = scratch + "/t"
    commit_batch_versioned(
        spark.createDataFrame([(1, 1.0)], "k bigint, __v double"), root,
        keys=["k"])
    with pytest.raises(ValueError, match="reserved"):
        read_version(spark, root).collect()


def test_differential_duplicate_recommit_converges(spark, scratch):
    """The at-least-once window: re-committing the SAME batch after a
    crash burns a version but the visible table converges (the twin
    delta's rows shadow their originals through latest-wins)."""
    root = scratch + "/t"
    b = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, v double")
    commit_batch_versioned(b, root, keys=["k"])
    commit_batch_versioned(b, root, keys=["k"])     # replayed batch
    rows = sorted(map(tuple, read_version(spark, root).collect()))
    assert rows == [(1, 10.0), (2, 20.0)]


def test_differential_null_key_latest_wins(spark, scratch):
    """NULL keys group as one partition in the resolution window -
    the same null-safe semantics the rewrite path's eqNullSafe
    anti-join gives."""
    root = scratch + "/t"
    commit_batch_versioned(
        spark.createDataFrame([(None, 1.0), (7, 2.0)],
                              "k bigint, v double"), root, keys=["k"])
    commit_batch_versioned(
        spark.createDataFrame([(None, 5.0)],
                              "k bigint, v double"), root, keys=["k"])
    rows = sorted(((r.k, r.v) for r in read_version(spark, root).collect()),
                  key=lambda t: (t[0] is None, t[0]))
    assert rows == [(7, 2.0), (None, 5.0)]


def test_differential_prune_key_clause_skips_and_matches_filter(spark,
                                                                scratch):
    """prune= on a MERGE-KEY column inside a delta chain: file-level
    skipping applies per member (all rows of a key share its verdict,
    so shadowing is unaffected) and equals the unpruned filtered read;
    a NON-key clause never file-prunes (it could resurrect a stale
    row) but still filters post-resolution."""
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        write_version_cas,
    )

    root = scratch + "/t"
    b1 = (spark.range(200)
          .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
          .repartitionByRange(4, "k"))
    write_version_cas(b1, root, expected_version=0,
                      stats_columns=["k", "v"],
                      manifest_extra={"delta": {"keys": ["k"]}})
    b2 = (spark.range(150, 250)
          .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
          .repartitionByRange(2, "k"))
    write_version_cas(b2, root, expected_version=1,
                      stats_columns=["k", "v"],
                      manifest_extra={"delta": {"keys": ["k"]}})
    for pred in [("k", "<", 50), ("k", "between", (140, 160)),
                 ("k", ">=", 240)]:
        got = sorted(map(tuple, read_version(spark, root,
                                             prune=pred).collect()))
        from etl_pipeline_mini_project_01_spark.sources.versioned import (
            _pred_column,
        )
        want = sorted(map(tuple, read_version(spark, root)
                          .filter(_pred_column(*pred)).collect()))
        assert got == want and want, pred
    # non-key clause: correct through the post-resolution filter (key
    # 160's stale v=160.0 must NOT resurrect even though v<200 would
    # file-match its old row and exclude its new 320.0 row)
    got = sorted(map(tuple, read_version(spark, root,
                                         prune=("v", "<", 200.0))
                     .collect()))
    want = sorted(map(tuple, read_version(spark, root)
                      .filter(F.col("v") < 200.0).collect()))
    assert got == want
    assert (160, 160.0) not in got


def test_sink_auto_compaction_bounds_chain_length(spark, scratch):
    """compact_every=2: after every second delta commit the chain is
    folded, so no read ever resolves more than base + 2 deltas; the
    final state is unchanged."""
    src, stream = _staged_events(spark, scratch)
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"))
    root = scratch + "/table"
    final = run_to_versioned_sink(agg, root, scratch + "/ckpt",
                                  keys=["user_id"], compact_every=2)
    want = {r["user_id"]: r["n"] for r in
            src.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    assert {r["user_id"]: r["n_events"] for r in final.collect()} == want
    # every committed head's chain is short: walk each version's chain
    from etl_pipeline_mini_project_01_spark.sources import fsio
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        _delta_chain,
        list_versions,
    )
    import os
    for v in list_versions(root):
        mp = os.path.join(root, "_versions", f"v{v:08d}.json")
        man = fsio.read_json(mp)
        if man.get("delta"):
            assert len(_delta_chain(root, man)) <= 3   # <= 2 deltas + base


def test_rewrite_rebase_retries_when_vacuum_races_the_read(
        spark, scratch, monkeypatch):
    """r15 sweep fix: in rewrite mode (differential=False) a rival
    commit + keep_last=1 vacuum can retire the version resolved by
    latest_readable_version before read_version opens it - the sink
    must RETRY (the head moved, the same situation as a
    VersionConflict), not crash the stream with FileNotFoundError."""
    from etl_pipeline_mini_project_01_spark.streaming import versioned_sink

    root = scratch + "/tbl"
    write_version(spark.createDataFrame([(1, 10.0)], "k bigint, v double"),
                  root)
    real_read = versioned_sink.read_version
    calls = {"n": 0}

    def flaky_read(sp, r, version=None, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FileNotFoundError("version vacuumed by a rival")
        return real_read(sp, r, version, **kw)

    monkeypatch.setattr(versioned_sink, "read_version", flaky_read)
    batch = spark.createDataFrame([(1, 99.0), (2, 5.0)],
                                  "k bigint, v double")
    v = commit_batch_versioned(batch, root, keys=["k"],
                               differential=False)
    assert v == 2 and calls["n"] >= 2
    got = {(r["k"], r["v"]) for r in read_version(spark, root, v).collect()}
    assert got == {(1, 99.0), (2, 5.0)}
