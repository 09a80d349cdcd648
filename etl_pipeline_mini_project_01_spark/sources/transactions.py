"""Multi-table transactions over versioned tables - the first half of
the "what a real Delta/Iceberg would STILL add" gap SCALE.md names
(the other half, a shared metastore SERVICE, is an infrastructure
swap, not an engine seam).

A transaction pins a CONSISTENT SET of per-table versions:

    txn_root/
      _txns/t00000001.json   one manifest per committed transaction
      _txns/t00000002.json     {"txn": n, "tables": {"orders": 2,
                                                     "lineitem": 2}}
      _LATEST                JSON copy of the newest txn manifest,
                             swapped in with os.replace
      orders/                ordinary sources/versioned.py tables
      lineitem/                (their own version logs)

Protocol (write-then-pin, the same commit order every multi-table
log uses):

  1. stage every table's NEW version through the per-table versioned
     layer (`write_version` / `write_version_cas` - fully committed at
     the TABLE level, but INVISIBLE to transactional readers);
  2. CAS-claim the next transaction number (O_CREAT|O_EXCL on the txn
     manifest - exactly one of N racing committers wins, losers get
     the retryable :class:`VersionConflict` and re-read + re-pin);
  3. write the manifest content (the {table: version} pin set) and
     publish `_LATEST` monotonically.

What this buys, stated as reader guarantees:
  * ATOMICITY across tables: a reader resolving a transaction sees
    either none or all of a commit's table versions - a writer that
    crashed after step 1 leaves per-table versions no transaction
    pins (orphans, enumerable via :func:`unpinned_table_versions`),
    never a half-visible commit;
  * SNAPSHOT ISOLATION: `read_txn_snapshot` resolves one immutable
    {table: version} set; concurrent commits cannot tear an in-flight
    multi-table read;
  * TIME TRAVEL: any retained transaction number replays the exact
    cross-table state as of that commit.

Scope: control-plane IO goes through sources/fsio.py (VERDICT r9 #2),
so txn roots may be scheme-less local paths OR ``file://`` / ``hdfs://``
/ ``s3a://`` URIs served by the session's Hadoop FileSystem client; the
txn manifest claim is ``create(overwrite=false)`` - a conditional PUT,
with the atomicity grade of the underlying filesystem (see fsio).
Tables named in a transaction must live UNDER txn_root by their
manifest name (the keys of `tables`)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import fsio
from .versioned import VersionConflict, read_version

_TDIR = "_txns"
_LATEST = "_LATEST"


def _txn_dir(root: str) -> str:
    return os.path.join(root, _TDIR)


def _tpath(root: str, t: int) -> str:
    return os.path.join(_txn_dir(root), f"t{t:08d}.json")


def list_txns(root: str) -> list[int]:
    """All claimed transaction numbers, ascending (including crashed
    zero-byte claims - they burn numbers exactly like versioned.py's
    manifest log)."""
    d = _txn_dir(root)
    if not fsio.isdir(d):
        return []
    return sorted(int(f[1:-5]) for f in fsio.listdir(d)
                  if f.startswith("t") and f.endswith(".json"))


def latest_txn(root: str) -> int:
    """Newest published transaction, 0 when none committed."""
    p = os.path.join(root, _LATEST)
    if not fsio.exists(p):
        return 0
    return int(fsio.read_json(p)["txn"])


def read_txn_manifest(root: str, txn: int | None = None) -> dict[str, int]:
    """The {table: version} pin set of a transaction (None = latest;
    an empty dict when no transaction has ever committed). Raises
    FileNotFoundError for never-claimed, crashed, or vacuumed txns."""
    if txn is None:
        p = os.path.join(root, _LATEST)
        if not fsio.exists(p):
            return {}
        return dict(fsio.read_json(p)["tables"])
    mp = _tpath(root, txn)
    if not fsio.exists(mp):
        raise FileNotFoundError(
            f"transaction {txn} of {root} does not exist "
            f"(claimed: {list_txns(root)})")
    if fsio.getsize(mp) == 0:
        raise FileNotFoundError(
            f"transaction {txn} of {root} is a crashed claim "
            "(number burned, never finalized)")
    return dict(fsio.read_json(mp)["tables"])


def commit_txn(root: str, tables: dict[str, int],
               expected_txn: int) -> int:
    """Pin `tables` ({name: already-committed per-table version}) as
    transaction `expected_txn + 1` IFF no other committer got there
    first (O_CREAT|O_EXCL claim), else raise the retryable
    :class:`VersionConflict`. The pin set is validated against each
    table's own manifest log - pinning a version that does not exist
    (or a crashed per-table claim) is a caller bug surfaced HERE, not
    at some future read.

    Retention contract vs a CONCURRENT `vacuum_txn`: a version older
    than the vacuum's retention window and pinned by no retained txn
    is fair game for reclamation, and this commit's validation cannot
    atomically extend protection over it (the check and the sweep are
    not one filesystem operation - the same reason Delta documents
    "do not time-travel past the retention period"). Fresh versions -
    the write-then-pin fast path - are inside the age gate and safe.
    For the old-version case the pins are RE-VALIDATED after the
    manifest lands: a commit that raced a vacuum fails loudly with
    RuntimeError here, instead of surfacing as a FileNotFoundError in
    some future reader's time travel."""
    for name, v in tables.items():
        mp = os.path.join(root, name, "_versions", f"v{v:08d}.json")
        if not fsio.exists(mp) or fsio.getsize(mp) == 0:
            raise ValueError(
                f"cannot pin {name}@v{v}: that version is not a "
                "readable commit of the table")
    fsio.makedirs(_txn_dir(root))
    head = max(list_txns(root), default=0)
    if head != expected_txn:
        raise VersionConflict(
            f"expected to extend transaction {expected_txn} of {root} "
            f"but the log is at {head}")
    t = expected_txn + 1
    try:
        claim = fsio.claim_excl(_tpath(root, t))
    except FileExistsError:
        raise VersionConflict(
            f"transaction {t} of {root} was claimed by a concurrent "
            "committer; re-read and retry") from None
    manifest = {"txn": t, "tables": {n: int(v) for n, v in tables.items()}}
    claim.finalize_json(manifest)
    # Pre-publish re-validation (see the retention contract above): a
    # vacuum that snapshotted its pin set before this txn's manifest
    # became readable may have reclaimed an OLD version this txn pins.
    # Once finalize_json lands, any NEW vacuum's _pinned_versions sees
    # the pins, so a version still readable here is protected from then
    # on. Checking BEFORE _publish_latest_txn means a detected-
    # unservable txn is never installed as the readers' pointer
    # (previously the broken txn was published as _LATEST first, so
    # every subsequent read_txn_snapshot() of latest failed until a new
    # commit landed); the manifest itself stays on disk as a burned
    # number with dead pins - time travel to it raises
    # FileNotFoundError, the documented crashed-commit shape.
    _check_pins_servable(root, tables, t, "the pin became readable")
    _publish_latest_txn(root, manifest)
    # Post-publish re-check, defense in depth: a vacuum that snapshotted
    # pins before finalize_json and swept between the check above and
    # the publish is still surfaced loudly at commit time.
    _check_pins_servable(root, tables, t, "the pin published")
    return t


def _check_pins_servable(root: str, tables: dict[str, int], t: int,
                         when: str) -> None:
    for name, v in tables.items():
        mp = os.path.join(root, name, "_versions", f"v{v:08d}.json")
        try:
            ok = fsio.getsize(mp) > 0
        except FileNotFoundError:
            ok = False
        if not ok:
            raise RuntimeError(
                f"transaction {t} of {root} pinned {name}@v{v} but a "
                f"concurrent vacuum reclaimed that version before "
                f"{when} - the txn is not servable; re-stage the "
                "table and commit a new transaction (see the retention "
                "contract in commit_txn's docstring)")


def _publish_latest_txn(root: str, manifest: dict) -> None:
    """Monotonic _LATEST publish under a short lock section - the
    same shape as versioned.py's pointer swap, so a slow committer of
    txn N can never locally regress the pointer past a published N+1
    (on remote filesystems the lock is fsio's documented no-op)."""
    with fsio.pointer_lock(root, "._txn_ptr_lock"):
        if latest_txn(root) >= manifest["txn"]:
            return
        fsio.write_json_atomic(os.path.join(root, _LATEST), manifest,
                               tmp_prefix="._latest_txn_")


def read_txn_snapshot(spark: SparkSession, root: str,
                      tables: list[str] | None = None,
                      txn: int | None = None,
                      prune: dict[str, tuple | list] | None = None
                      ) -> dict[str, DataFrame]:
    """A CONSISTENT multi-table snapshot: every requested table read at
    the version the transaction pinned (None = latest transaction;
    `tables` None = every table the transaction names). Raises KeyError
    when the transaction does not pin a requested table - a reader
    asking for a table outside the pin set would otherwise silently
    get non-transactional data.

    `prune` maps table name -> read_version-style predicate(s) (r12
    data skipping): the pinned version's manifest stats drop files the
    predicate provably excludes, and the predicate is re-applied as a
    filter - transactional reads get the same manifest-level skipping
    as single-table reads, against exactly the pinned snapshot."""
    pins = read_txn_manifest(root, txn)
    names = list(pins) if tables is None else list(tables)
    # a prune key naming no table in the read set is a caller typo
    # ("ordrs") that would otherwise silently return an UNPRUNED,
    # UNFILTERED read of the intended table - surface it loudly
    stray = set(prune or {}) - set(names)
    if stray:
        raise KeyError(
            f"prune names table(s) {sorted(stray)} that this snapshot "
            f"read does not include (reading: {sorted(names)})")
    out: dict[str, DataFrame] = {}
    for name in names:
        if name not in pins:
            raise KeyError(
                f"transaction {txn if txn is not None else latest_txn(root)}"
                f" of {root} does not pin table {name!r} "
                f"(pinned: {sorted(pins)})")
        out[name] = read_version(spark, os.path.join(root, name),
                                 pins[name],
                                 prune=(prune or {}).get(name))
    return out


def list_txn_tables(root: str) -> list[str]:
    """Every versioned table living under the txn root - enumerated by
    the presence of a `_versions` manifest log, NOT by appearing in a
    retained transaction pin (ADVICE r9: a table whose versions were
    staged but never pinned - the crash-at-step-1 shape on a brand-new
    table, or one whose pinning txns were all vacuumed - must still be
    visible to the orphan sweep)."""
    if not fsio.isdir(root):
        return []
    out = []
    for e in fsio.scandir(root):
        if (e.is_dir and not e.name.startswith(("_", "."))
                and fsio.isdir(os.path.join(root, e.name, "_versions"))):
            out.append(e.name)
    return sorted(out)


def _pinned_versions(root: str) -> dict[str, set[int]]:
    """{table: versions} pinned by ANY retained (readable) txn."""
    pinned: dict[str, set[int]] = {}
    for t in list_txns(root):
        try:
            pins = read_txn_manifest(root, t)
        except FileNotFoundError:          # crashed claim
            continue
        for n, v in pins.items():
            pinned.setdefault(n, set()).add(v)
    return pinned


def unpinned_table_versions(root: str) -> dict[str, list[int]]:
    """Per-table versions NO retained transaction pins - the orphans a
    crashed write-then-pin leaves at step 1, plus versions whose txns
    were vacuumed. These are the safe inputs to reclamation
    (:func:`vacuum_txn` consumes exactly this set; the enumeration
    itself never deletes anything). Tables are discovered by their
    `_versions` log, so a never-pinned table's snapshots are named
    too."""
    from .versioned import list_versions

    pinned = _pinned_versions(root)
    out: dict[str, list[int]] = {}
    for name in list_txn_tables(root):
        vs = list_versions(os.path.join(root, name))
        orphans = [v for v in vs if v not in pinned.get(name, set())]
        if orphans:
            out[name] = orphans
    return out


def vacuum_txns(root: str, keep_last: int = 2,
                claim_retention_sec: float = 24 * 3600.0) -> list[int]:
    """Rotate the TRANSACTION log down to the newest `keep_last`
    READABLE manifests - readable means finalized content, so a
    crashed zero-byte claim at the head can never evict a readable
    txn from the retained window (that would both break its time
    travel and let :func:`vacuum_txn` delete the table versions it
    pins). The published _LATEST txn is always retained, mirroring
    vacuum_versions' keep-the-pointer rule.

    Zero-byte claims outside the kept set are crash debris ONLY once
    they are old: a fresh claim is indistinguishable from an IN-FLIGHT
    committer between its O_EXCL win and its finalize, and removing it
    would let a rival claim the same number - split brain. They are
    swept only when older than `claim_retention_sec` by mtime (the
    same presumed-dead rule as versioned.py's stage dirs; 0.0
    force-sweeps under single-owner maintenance). Returns the removed
    txn numbers. Pins held by removed transactions stop protecting
    table versions - run :func:`vacuum_txn` afterwards (or instead)
    to reclaim."""
    import time

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    txns = list_txns(root)

    def _tsize(t: int) -> int:
        try:
            return fsio.getsize(_tpath(root, t))
        except FileNotFoundError:
            return -1                      # rival vacuum removed it
    readable = [t for t in txns if _tsize(t) > 0]
    keep = set(readable[-keep_last:]) | {latest_txn(root)}
    now = time.time()
    drop: list[int] = []
    for t in txns:
        if t in keep:
            continue
        p = _tpath(root, t)
        try:
            if (fsio.getsize(p) == 0
                    and now - fsio.getmtime(p) < claim_retention_sec):
                continue                   # possibly in-flight claim
            fsio.remove(p)
        except FileNotFoundError:
            continue                       # a rival vacuum got it first
        drop.append(t)
    return drop


def vacuum_txn(root: str, keep_last_txns: int = 2,
               stage_retention_sec: float = 24 * 3600.0
               ) -> dict[str, list[int]]:
    """Transaction-aware storage reclamation (VERDICT r9 #4): rotate
    the txn log to `keep_last_txns`, then for every table under the
    root remove exactly the snapshots that are

      * pinned by NO retained transaction (per-table `vacuum_versions`
        cannot be trusted here: its newest-N rule could delete a
        version an OLD retained txn still pins - a time-travel break -
        or retain unpinned orphans forever), AND
      * not the table's newest readable version (the table-level read
        path - `latest_version` / a bare `read_version(None)` - stays
        servable even for tables no retained txn pins), AND
      * older than `stage_retention_sec` by manifest mtime (the
        write-then-pin protocol makes a freshly-committed-but-not-yet-
        pinned version indistinguishable from crash debris - the age
        gate is what lets an IN-FLIGHT committer survive a concurrent
        vacuum, the same rule as versioned.py's CAS stage dirs; 0.0
        force-sweeps under single-owner maintenance).

    Removal order per snapshot mirrors vacuum_versions: manifest
    first, directory second - a crash mid-vacuum leaves an orphan
    directory (re-vacuumable), never a manifest naming nothing.
    Returns {table: [removed versions]}."""
    import time

    from .versioned import latest_readable_version, latest_version

    vacuum_txns(root, keep_last=keep_last_txns,
                claim_retention_sec=stage_retention_sec)
    pinned = _pinned_versions(root)
    removed: dict[str, list[int]] = {}
    now = time.time()
    for name in list_txn_tables(root):
        troot = os.path.join(root, name)
        keep = pinned.get(name, set()) | {latest_version(troot),
                                          latest_readable_version(troot)}
        gone: list[int] = []
        mdir = os.path.join(troot, "_versions")
        for e in fsio.scandir(mdir):
            if not (e.name.startswith("v") and e.name.endswith(".json")):
                continue
            v = int(e.name[1:-5])
            if v in keep or now - e.mtime < stage_retention_sec:
                continue
            try:
                fsio.remove(os.path.join(mdir, e.name))
            except FileNotFoundError:
                continue                   # a rival vacuum got it first
            fsio.rmtree(os.path.join(troot, f"v{v:08d}"))
            gone.append(v)
        if gone:
            removed[name] = sorted(gone)
        # crash-at-staging debris: a committer that died during its
        # parquet write leaves a `._stage_*` dir with no manifest -
        # invisible to the version loop above, and per-table
        # vacuum_versions is FORBIDDEN on txn roots (it could delete a
        # pinned version), so this is the only reclamation path such
        # debris has. Same age gate as versioned.py: a fresh stage dir
        # may be a live committer's.
        for e in fsio.scandir(troot):
            if (e.name.startswith("._stage_") and e.is_dir
                    and now - e.mtime >= stage_retention_sec):
                fsio.rmtree(os.path.join(troot, e.name))
    return removed
