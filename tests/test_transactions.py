"""Multi-table transactions (sources/transactions.py): write-then-pin
atomicity across versioned tables, snapshot isolation for multi-table
readers, CAS arbitration on the transaction number, crashed-claim
burn-and-recover, and orphan enumeration."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

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


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="txn_")
    yield d
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
    open(os.path.join(root, "_txns", "t00000002.json"), "w").close()
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
