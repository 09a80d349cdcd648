"""Versioned tables + time travel (sources/versioned.py): dense
version numbering, as-of reads, atomic _LATEST swap semantics, orphan
cleanup, and the SCD2 history-replay use case the layer exists for.

The whole battery is parametrized over a scheme-less root AND the
``file://`` form of the same directory (VERDICT r9 #2): the latter
routes every control-plane operation through the session's Hadoop
FileSystem client - the exact JVM code path hdfs://s3a:// roots take -
and must be behavior-identical. Raw filesystem assertions therefore go
through sources/fsio.py, which dispatches per-path the same way the
engine does."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from etl_pipeline_mini_project_01_spark.sources import fsio
from etl_pipeline_mini_project_01_spark.sources.versioned import (
    latest_version,
    list_versions,
    read_version,
    vacuum_versions,
    write_version,
)


@pytest.fixture(params=["plain", "file_uri"])
def root(request):
    d = tempfile.mkdtemp(prefix="vtbl_")
    yield (d + "/t") if request.param == "plain" else f"file://{d}/t"
    shutil.rmtree(d, ignore_errors=True)


def test_time_travel_reads_old_snapshots(spark, root):
    v1 = write_version(spark.createDataFrame([(1, "a")], "k bigint, s string"),
                       root)
    v2 = write_version(spark.createDataFrame([(1, "b"), (2, "c")],
                                             "k bigint, s string"), root)
    assert (v1, v2) == (1, 2)
    assert latest_version(root) == 2
    assert sorted(map(tuple, read_version(spark, root).collect())) \
        == [(1, "b"), (2, "c")]
    assert sorted(map(tuple, read_version(spark, root, 1).collect())) \
        == [(1, "a")]
    with pytest.raises(FileNotFoundError, match="version 9"):
        read_version(spark, root, 9)


def test_scd2_replay_use_case(spark, root):
    """The reason the layer exists: each merge commits a version, so
    'the dim as the pipeline saw it N runs ago' is one read - the
    time-travel half of the Delta TODO."""
    from etl_pipeline_mini_project_01_spark.operators.scd import (
        scd2_initial,
        scd2_merge,
    )
    dim = scd2_initial(
        spark.createDataFrame([(1, "basic")], "account_id bigint, tier string"),
        "2024-01-01 00:00:00")
    write_version(dim, root)
    dim2 = scd2_merge(
        read_version(spark, root),
        spark.createDataFrame([(1, "pro")], "account_id bigint, tier string"),
        "account_id", ["tier"], "2024-01-15 00:00:00")
    write_version(dim2, root)
    old = read_version(spark, root, 1)
    new = read_version(spark, root, 2)
    assert old.count() == 1 and new.count() == 2
    assert [r.tier for r in new.filter("is_current").collect()] == ["pro"]


def test_latest_swap_is_atomic_file(spark, root):
    """_LATEST is a complete JSON manifest (atomic-replace target), and
    a reader that resolved a version BEFORE a new commit still reads its
    immutable snapshot afterwards - no rename-out-from-under."""
    write_version(spark.createDataFrame([(1,)], "k bigint"), root)
    pinned = read_version(spark, root, 1)
    m = fsio.read_json(os.path.join(root, "_LATEST"))
    assert m == {"version": 1, "dir": "v00000001"}
    write_version(spark.createDataFrame([(2,)], "k bigint"), root)
    # the pinned plan still reads snapshot 1's directory
    assert [tuple(r) for r in pinned.collect()] == [(1,)]
    assert not [f for f in fsio.listdir(root) if f.startswith("._latest_")]


def test_crashed_commit_does_not_wedge_future_writes(spark, root):
    """ADVICE r6: a writer that died after landing _versions/vN.json
    but BEFORE the _LATEST swap must not block the next commit. Version
    allocation reads the manifest log (max+1), so the next write lands
    N+1 and swaps _LATEST forward; the crashed snapshot stays readable
    by explicit version (it was fully written before its manifest)."""
    write_version(spark.createDataFrame([(1,)], "k bigint"), root)
    latest_v1 = fsio.read_bytes(os.path.join(root, "_LATEST"))
    write_version(spark.createDataFrame([(2,)], "k bigint"), root)
    # simulate the crash window: roll _LATEST back to v1 while v2's
    # manifest + directory remain on disk
    fsio.write_bytes(os.path.join(root, "_LATEST"), latest_v1)
    assert latest_version(root) == 1          # readers: consistent v1
    v3 = write_version(spark.createDataFrame([(3,)], "k bigint"), root)
    assert v3 == 3                            # not a re-collision on 2
    assert latest_version(root) == 3
    assert [tuple(r) for r in read_version(spark, root, 2).collect()] \
        == [(2,)]


def test_vacuum_rejects_keep_last_below_one(spark, root):
    """ADVICE r6: keep_last=0 would leave _LATEST pointing at a deleted
    snapshot; the call is rejected instead."""
    write_version(spark.createDataFrame([(1,)], "k bigint"), root)
    with pytest.raises(ValueError, match="keep_last"):
        vacuum_versions(root, keep_last=0)
    assert list_versions(root) == [1]


def test_vacuum_keeps_recent_and_sweeps_orphans(spark, root):
    for i in range(4):
        write_version(spark.createDataFrame([(i,)], "k bigint"), root)
    # a crashed writer's orphan: directory without a manifest
    fsio.makedirs(os.path.join(root, "v00000099"))
    removed = vacuum_versions(root, keep_last=2)
    assert removed == [1, 2]
    assert list_versions(root) == [3, 4]
    assert not fsio.exists(os.path.join(root, "v00000001"))
    assert not fsio.exists(os.path.join(root, "v00000099"))
    assert [tuple(r) for r in read_version(spark, root, 3).collect()] \
        == [(2,)]
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 1)


def test_vacuum_keeps_the_latest_pointer_live(spark, root):
    """ADVICE r7: after a crashed commit the log can be AHEAD of
    _LATEST (v2.json landed, _LATEST still at v1). vacuum(keep_last=1)
    must then keep BOTH v2 (log tail) and v1 (the version readers
    actually resolve) - dropping v1 would leave _LATEST pointing at a
    deleted snapshot and read_version(root) raising."""
    write_version(spark.createDataFrame([(1,)], "k bigint"), root)
    latest_v1 = fsio.read_bytes(os.path.join(root, "_LATEST"))
    write_version(spark.createDataFrame([(2,)], "k bigint"), root)
    fsio.write_bytes(os.path.join(root, "_LATEST"), latest_v1)  # crash window
    removed = vacuum_versions(root, keep_last=1)
    assert removed == []                      # v1 is _LATEST, v2 is tail
    assert latest_version(root) == 1
    assert [tuple(r) for r in read_version(spark, root).collect()] \
        == [(1,)]
    assert [tuple(r) for r in read_version(spark, root, 2).collect()] \
        == [(2,)]


def test_cas_racing_committers_exactly_one_wins(spark, root):
    """VERDICT r7 #7: two committers stage against the same parent;
    the one that claims the manifest first wins, the other gets the
    retryable VersionConflict, and a retry against the NEW head
    succeeds. The winner's data - never a torn mix - is what readers
    see in between."""
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        VersionConflict,
        write_version_cas,
    )
    v1 = write_version_cas(
        spark.createDataFrame([(1, "base")], "k bigint, s string"),
        root, expected_version=0)
    assert v1 == 1
    a = spark.createDataFrame([(2, "a")], "k bigint, s string")
    b = spark.createDataFrame([(2, "b")], "k bigint, s string")
    # racer A wins v2; racer B (staged against the same parent v1)
    # must conflict, not overwrite
    assert write_version_cas(a, root, expected_version=1) == 2
    with pytest.raises(VersionConflict):
        write_version_cas(b, root, expected_version=1)
    assert latest_version(root) == 2
    assert sorted(map(tuple, read_version(spark, root).collect())) \
        == [(2, "a")]
    # the loser's retry loop: re-read the head, re-stage, commit
    assert write_version_cas(b, root, expected_version=2) == 3
    assert sorted(map(tuple, read_version(spark, root).collect())) \
        == [(2, "b")]
    # no stage-dir litter from the conflicted attempt
    assert not [e for e in fsio.listdir(root) if e.startswith("._stage_")]


def test_cas_claim_race_on_manifest_file(spark, root):
    """The arbitration point itself: when the loser passes the
    fast-path head check but the winner lands the manifest first, the
    create-if-absent claim - not the stale head read - must reject it.
    The race is injected at fsio.claim_excl, so the same test exercises
    the os.open O_EXCL arbitration (plain root) AND the Hadoop
    create(overwrite=false) arbitration (file:// root)."""
    from unittest import mock

    from etl_pipeline_mini_project_01_spark.sources import versioned
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        VersionConflict,
        write_version_cas,
    )
    write_version_cas(spark.createDataFrame([(1,)], "k bigint"), root, 0)
    df = spark.createDataFrame([(2,)], "k bigint")
    real_claim = fsio.claim_excl

    def winner_lands_first(path):
        if path.endswith("v00000002.json") and not fsio.exists(path):
            # simulate the concurrent winner claiming between the head
            # check and our claim
            fsio.write_bytes(path,
                             b'{"version": 2, "dir": "v00000002"}')
        return real_claim(path)

    with mock.patch.object(versioned.fsio, "claim_excl",
                           side_effect=winner_lands_first):
        with pytest.raises(VersionConflict, match="claimed by a concurrent"):
            write_version_cas(df, root, expected_version=1)
    assert not [e for e in fsio.listdir(root) if e.startswith("._stage_")]


def test_cas_crashed_claim_burns_number_but_recovers(spark, root):
    """Crash window between the manifest claim and its content: the
    zero-byte manifest reads as a crashed commit, the version number
    is burned (the log allocates past it), and vacuum sweeps any
    staged orphan."""
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        write_version_cas,
    )
    write_version_cas(spark.createDataFrame([(1,)], "k bigint"), root, 0)
    # simulate the crash: claimed manifest, no content, staged dir left
    fsio.write_bytes(os.path.join(root, "_versions", "v00000002.json"), b"")
    fsio.makedirs(os.path.join(root, "._stage_deadbeef"))
    with pytest.raises(FileNotFoundError, match="crashed CAS commit"):
        read_version(spark, root, 2)
    assert latest_version(root) == 1          # readers undisturbed
    v3 = write_version(spark.createDataFrame([(3,)], "k bigint"), root)
    assert v3 == 3                            # allocation skips the burn
    # a FRESH stage dir is indistinguishable from a live committer's -
    # the default retention must leave it alone (ADVICE r8) ...
    vacuum_versions(root, keep_last=3)
    assert fsio.exists(os.path.join(root, "._stage_deadbeef"))
    # ... and only an aged-out one is swept
    vacuum_versions(root, keep_last=3, stage_retention_sec=0.0)
    assert not fsio.exists(os.path.join(root, "._stage_deadbeef"))


def test_cas_true_concurrency_exactly_n_commits(spark, root):
    """REAL interleaving, not injected: four committers race the CAS
    retry loop concurrently (threads sharing the session - each stages
    its own snapshot, claims optimistically, re-reads the head and
    re-stages on conflict). Exactly four versions must land - dense
    numbering, no torn or lost commit - and each committer's own rows
    must be readable at the version it was told it won. Runs on both
    the os.* O_EXCL arbitration and the Hadoop create(overwrite=false)
    arbitration via the root parametrization."""
    from concurrent.futures import ThreadPoolExecutor

    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        VersionConflict,
        write_version_cas,
    )

    def committer(i: int) -> int:
        df = spark.createDataFrame([(i, f"writer{i}")],
                                   "k bigint, s string")
        for _ in range(40):
            head = max(list_versions(root), default=0)
            try:
                return write_version_cas(df, root, expected_version=head)
            except VersionConflict:
                continue
        raise AssertionError(f"committer {i} starved after 40 retries")

    with ThreadPoolExecutor(max_workers=4) as pool:
        wins = list(pool.map(committer, range(4)))

    assert sorted(wins) == [1, 2, 3, 4]        # dense, no burns, no loss
    assert list_versions(root) == [1, 2, 3, 4]
    assert latest_version(root) == 4
    for i, v in enumerate(wins):
        assert [tuple(r) for r in read_version(spark, root, v).collect()] \
            == [(i, f"writer{i}")]
    # no stage litter from any conflicted attempt
    import etl_pipeline_mini_project_01_spark.sources.fsio as fsio_
    assert not [e for e in fsio_.listdir(root)
                if e.startswith("._stage_")]


def test_vacuum_keep_last_counts_readable_versions(spark, root):
    """A zero-byte crashed claim must not consume a `keep_last` slot:
    with [v1 readable, v2 readable, v3 crashed claim], keep_last=2
    retains BOTH readable snapshots and sweeps only the aged-out
    claim (whose number may then be re-allocated - it never published
    content)."""
    write_version(spark.createDataFrame([(1,)], "k bigint"), root)
    write_version(spark.createDataFrame([(2,)], "k bigint"), root)
    fsio.write_bytes(os.path.join(root, "_versions", "v00000003.json"), b"")

    removed = vacuum_versions(root, keep_last=2, stage_retention_sec=0.0)
    assert removed == [3]
    assert sorted(r.k for r in read_version(spark, root, 1).collect()) == [1]
    assert sorted(r.k for r in read_version(spark, root, 2).collect()) == [2]


def test_vacuum_age_gate_spares_fresh_crashed_claim(spark, root):
    """A fresh zero-byte claim may be an IN-FLIGHT CAS committer
    between its claim and its finalize; removing it would let a rival
    claim the same number. Default retention leaves it alone."""
    write_version(spark.createDataFrame([(1,)], "k bigint"), root)
    fsio.write_bytes(os.path.join(root, "_versions", "v00000002.json"), b"")

    assert vacuum_versions(root, keep_last=1) == []
    assert fsio.exists(os.path.join(root, "_versions", "v00000002.json"))


def test_orphan_dir_sweep_rechecks_manifest_ownership(spark, root):
    """The orphan-vNNN sweep must re-check ownership against the
    manifest file AT SWEEP TIME: a commit claims its manifest BEFORE
    the stage->vNNN rename, so a dir whose manifest exists (even a
    still-zero-byte claim - a committer between its rename and its
    finalize) is a live commit a stale pre-computed kept set would
    wrongly rmtree. Only a dir with NO manifest at all (crash-mid-
    vacuum debris) is swept."""
    write_version(spark.createDataFrame([(1,)], "k bigint"), root)
    # a committer mid-flight: claim landed (zero-byte), dir renamed,
    # finalize pending
    fsio.write_bytes(os.path.join(root, "_versions", "v00000002.json"), b"")
    fsio.makedirs(os.path.join(root, "v00000002"))
    # true debris: a dir with no manifest (crash-mid-vacuum shape)
    fsio.makedirs(os.path.join(root, "v00000099"))

    vacuum_versions(root, keep_last=1)
    assert fsio.isdir(os.path.join(root, "v00000002"))   # owned: spared
    assert not fsio.exists(os.path.join(root, "v00000099"))


def test_table_staged_commit_matches_spark_staged(spark, root):
    """r15 driver-staged control-plane commits: write_version_table /
    write_version_cas_table must be protocol- and content-identical to
    the Spark-staged writers - same version numbering, same snapshot
    shape (one parquet file a Spark read resolves), same parquet schema
    as the Spark-staged manifest frame, and CAS arbitration intact.
    Scheme-qualified roots are rejected (they must keep the
    Hadoop-client path)."""
    import pyarrow as pa

    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        VersionConflict, write_version_cas_table, write_version_table)

    rows = [(0, "cluster=0/a.parquet", None),
            (1, "cluster=1/b.parquet", '{"s": 1}')]
    tab = pa.table({
        "cluster": pa.array([r[0] for r in rows], type=pa.int32()),
        "file": pa.array([r[1] for r in rows], type=pa.string()),
        "stats": pa.array([r[2] for r in rows], type=pa.string()),
    })
    if fsio.has_scheme(root):
        with pytest.raises(ValueError):
            write_version_table(tab, root)
        return
    # spark-staged v1, driver-staged v2: same log, dense numbering
    sdf = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows],
        schema="cluster int, file string, stats string").coalesce(1)
    v1 = write_version(sdf, root)
    v2 = write_version_table(tab, root)
    assert (v1, v2) == (1, 2)
    a = read_version(spark, root, v1).orderBy("cluster")
    b = read_version(spark, root, v2).orderBy("cluster")
    assert a.schema == b.schema
    assert a.collect() == b.collect()
    # identical physical parquet schema (so mixed logs read uniformly)
    import pyarrow.parquet as papq

    def snap_schema(v):
        d = os.path.join(root, f"v{v:08d}")
        f = [x for x in os.listdir(d) if x.endswith(".parquet")]
        return papq.read_schema(os.path.join(d, f[0]))
    assert snap_schema(v1).equals(snap_schema(v2))
    # CAS grade: stale expected_version loses BEFORE any claim
    with pytest.raises(VersionConflict):
        write_version_cas_table(tab, root, expected_version=0)
    v3 = write_version_cas_table(tab, root, expected_version=v2)
    assert v3 == 3 and latest_version(root) == 3
