"""Degraded commit mode pinned by injection (VERDICT r10 #6): on raw
S3A without conditional writes, fsio's docstring states that
``claim_excl`` is best-effort check-then-create and ``pointer_lock`` is
a no-op - the CAS log stays the sole arbitration authority and readers
rebase on ``latest_readable_version``. Nothing TESTED that degraded
mode before this battery; the docstring was trusted. Here an injected
fake reproduces the non-atomic create (a HEAD check, a controllable
race window, then an unconditional whole-object PUT - the exact S3A
shape) and pins the documented contract:

  * OUTSIDE the race window the check still arbitrates: a sequential
    second committer gets the retryable VersionConflict, rebase +
    retry succeeds - the common case is unchanged;
  * a reader during the claim->finalize window (claim PUT landed,
    content PUT not yet) sees the PREVIOUS version via
    latest_readable_version - never a half-commit;
  * INSIDE the race window the loss is the documented one - the
    winner's acknowledged commit degrades to the crashed-claim shape
    (zero-content manifest, number burned) and the loser fails LOUDLY
    mid-commit - never a silently-wrong or torn snapshot, and the log
    stays consistent: the next writer allocates past the burned
    number and readers resume on it. This is exactly why Delta on S3
    documents a coordination service for multi-writer commits; the
    engine's honest grade is pinned, not papered over.

Parametrized over scheme-less and file:// roots like the rest of the
storage batteries, so the JVM code path remote schemes take is
exercised too.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from etl_pipeline_mini_project_01_spark.sources import fsio
from etl_pipeline_mini_project_01_spark.sources.versioned import (
    VersionConflict,
    latest_readable_version,
    latest_version,
    list_versions,
    read_version,
    write_version,
    write_version_cas,
)


@pytest.fixture(params=["plain", "file_uri"])
def root(request, spark):
    d = tempfile.mkdtemp(prefix="degraded_")
    yield d if request.param == "plain" else f"file://{d}"
    shutil.rmtree(d, ignore_errors=True)


class DegradedClaim:
    """S3A-without-conditional-writes claim: exists() check (HEAD),
    an injectable race window, then an UNCONDITIONAL create (PUT) -
    no O_EXCL anywhere. finalize_json is a second whole-object PUT,
    mirroring how the real ExclClaim's open-stream write lands as one
    object on blob stores."""

    race_hook = staticmethod(lambda path: None)

    def __init__(self, path: str):
        if fsio.exists(path):                   # the HEAD check
            raise FileExistsError(path)
        DegradedClaim.race_hook(path)           # the unprotected window
        fsio.write_bytes(path, b"", overwrite=True)   # unconditional PUT
        self.path = path

    def finalize_json(self, obj) -> None:
        fsio.write_bytes(self.path, json.dumps(obj).encode("utf-8"),
                         overwrite=True)


@pytest.fixture
def degraded(monkeypatch):
    monkeypatch.setattr(fsio, "claim_excl", DegradedClaim)
    monkeypatch.setattr(DegradedClaim, "race_hook",
                        staticmethod(lambda path: None))
    yield DegradedClaim


def _df(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "k bigint")


def test_sequential_committers_still_arbitrate(spark, root, degraded):
    """Outside the race window the HEAD check catches the conflict:
    the stale committer gets a retryable VersionConflict (at the
    expected-version check or at the claim), and a rebased retry
    lands cleanly."""
    v1 = write_version_cas(_df(spark, [1]), root, 0)
    assert v1 == 1
    with pytest.raises(VersionConflict):
        write_version_cas(_df(spark, [2]), root, 0)   # stale expectation
    v2 = write_version_cas(_df(spark, [2]), root, v1)
    assert v2 == 2
    assert {r["k"] for r in read_version(spark, root, 2).collect()} == {2}


def test_reader_never_sees_half_commit(spark, root, degraded):
    """Between the claim PUT (zero-byte manifest) and the content PUT,
    readers on latest_readable_version serve the previous version -
    the half-commit is invisible, exactly the crashed-claim shape."""
    write_version(_df(spark, [1]), root)
    # an in-flight committer: claim landed, finalize not yet
    mpath = os.path.join(root, "_versions", "v00000002.json")
    claim = fsio.claim_excl(mpath)
    assert latest_readable_version(root) == 1
    assert {r["k"] for r in read_version(spark, root).collect()} == {1}
    claim.finalize_json({"version": 2, "dir": "v00000002"})
    # content never made it to a data dir in this simulation; the point
    # above is the READ barrier during the window.


def test_race_before_the_check_is_a_version_conflict(spark, root,
                                                     degraded):
    """A rival landing BEFORE the claim's existence check (any time
    between the head read and the HEAD probe) is still caught: the
    degraded claim sees the rival's manifest, raises FileExistsError,
    and write_version_cas surfaces the retryable VersionConflict -
    the CAS log stays the arbitration authority for every race the
    check can see; no data is touched."""
    write_version(_df(spark, [1]), root)
    fired = []
    orig_init = DegradedClaim.__init__

    def init_with_pre_check_race(self, path):
        if not fired:
            fired.append(True)
            # the rival commits v2 completely before A's HEAD check
            write_version_cas(_df(spark, [2]), root, 1)
        orig_init(self, path)

    DegradedClaim.__init__ = init_with_pre_check_race
    try:
        with pytest.raises(VersionConflict):
            write_version_cas(_df(spark, [3]), root, 1)
    finally:
        DegradedClaim.__init__ = orig_init
    # rival's commit intact, readers unharmed, a rebased retry lands
    assert {r["k"] for r in read_version(spark, root, 2).collect()} == {2}
    assert write_version_cas(_df(spark, [3]), root, 2) == 3


def test_lost_race_inside_window_never_tears_readers(spark, root,
                                                     degraded):
    """The unprotected window itself: a rival lands a FULL commit of
    the same version inside writer A's check->PUT window - the race no
    client-side check can see without a true conditional PUT. Pin the
    documented degradation per backend, which in BOTH cases is
    acknowledged-commit loss (the reason Delta on S3 needs a
    coordination service), NEVER torn or interleaved reader state:

      * scheme-less (os.rename refuses an existing destination): A
        fails LOUDLY mid-commit; its empty claim PUT trampled the
        rival's manifest to the crashed-claim shape - the burned
        number is skipped by latest_readable_version and the log
        allocates past it;
      * Hadoop path (FileSystem.rename MOVES INTO an existing
        directory): A's staged dir nests INVISIBLY (`._stage_*` is
        dot-prefixed, parquet readers ignore it) inside the rival's
        snapshot and A's finalize rewrites byte-identical manifest
        content - A's acknowledged commit silently becomes the
        rival's; readers stay consistent on the rival's rows.
    """
    base = write_version(_df(spark, [1]), root)
    assert base == 1

    def rival_wins(path):
        # the rival commits v2 completely inside A's race window
        DegradedClaim.race_hook = staticmethod(lambda p: None)
        write_version_cas(_df(spark, [2]), root, 1)

    DegradedClaim.race_hook = staticmethod(rival_wins)
    hadoop = fsio.has_scheme(root)
    if hadoop:
        # A "succeeds" - the acknowledged-loss grade
        assert write_version_cas(_df(spark, [3]), root, 1) == 2
        # readers are consistent on the RIVAL's rows; A's data is gone
        assert latest_readable_version(root) == 2
        assert {r["k"] for r in
                read_version(spark, root, 2).collect()} == {2}
    else:
        with pytest.raises(OSError):
            # A tramples the rival's manifest with its empty claim PUT,
            # then fails loudly renaming onto the rival's snapshot dir
            write_version_cas(_df(spark, [3]), root, 1)
        assert fsio.getsize(os.path.join(root, "_versions",
                                         "v00000002.json")) == 0
        # the pointer (published by the rival pre-trample) now names a
        # crashed commit - loud, not torn; strict readers rebase
        with pytest.raises(FileNotFoundError, match="crashed"):
            read_version(spark, root)
        assert latest_readable_version(root) == 1
        assert {r["k"] for r in
                read_version(spark, root, 1).collect()} == {1}

    assert list_versions(root) == [1, 2]
    # recovery on both backends: the next commit allocates past the
    # lost/burned number and readers resume on it
    v3 = write_version(_df(spark, [4]), root)
    assert v3 == 3
    assert latest_readable_version(root) == 3
    assert {r["k"] for r in read_version(spark, root).collect()} == {4}


def test_degraded_txn_claims_still_arbitrate(spark, root, degraded):
    """The TRANSACTION layer's claim degrades the same way (commit_txn
    goes through the same fsio.claim_excl): outside the race window a
    stale committer gets the retryable VersionConflict at the head
    check or the claim, the winner's pin set is undisturbed, and a
    rebased retry lands. Multi-table snapshot isolation survives the
    degraded claim."""
    from etl_pipeline_mini_project_01_spark.sources.transactions import (
        commit_txn,
        latest_txn,
        read_txn_snapshot,
    )

    ov = write_version(_df(spark, [1]), os.path.join(root, "orders"))
    iv = write_version(_df(spark, [10]), os.path.join(root, "items"))
    t1 = commit_txn(root, {"orders": ov, "items": iv}, 0)
    assert t1 == 1
    ov2 = write_version(_df(spark, [2]), os.path.join(root, "orders"))
    with pytest.raises(VersionConflict):
        commit_txn(root, {"orders": ov2}, 0)          # stale expectation
    t2 = commit_txn(root, {"orders": ov2, "items": iv}, t1)
    assert t2 == 2 and latest_txn(root) == 2
    snap = read_txn_snapshot(spark, root)
    assert {r["k"] for r in snap["orders"].collect()} == {2}
    assert {r["k"] for r in snap["items"].collect()} == {10}
    old = read_txn_snapshot(spark, root, txn=1)
    assert {r["k"] for r in old["orders"].collect()} == {1}
