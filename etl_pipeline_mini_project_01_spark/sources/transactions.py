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

Scope: the local-FS stand-in contract of sources/versioned.py (the
txn manifest claim is a conditional PUT against a manifest service at
100 TB). Tables named in a transaction must live UNDER txn_root by
their manifest name (the keys of `tables`)."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

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
    if not os.path.isdir(d):
        return []
    return sorted(int(f[1:-5]) for f in os.listdir(d)
                  if f.startswith("t") and f.endswith(".json"))


def latest_txn(root: str) -> int:
    """Newest published transaction, 0 when none committed."""
    p = os.path.join(root, _LATEST)
    if not os.path.exists(p):
        return 0
    with open(p, encoding="utf-8") as fh:
        return int(json.load(fh)["txn"])


def read_txn_manifest(root: str, txn: int | None = None) -> dict[str, int]:
    """The {table: version} pin set of a transaction (None = latest;
    an empty dict when no transaction has ever committed). Raises
    FileNotFoundError for never-claimed, crashed, or vacuumed txns."""
    if txn is None:
        p = os.path.join(root, _LATEST)
        if not os.path.exists(p):
            return {}
        with open(p, encoding="utf-8") as fh:
            return dict(json.load(fh)["tables"])
    mp = _tpath(root, txn)
    if not os.path.exists(mp):
        raise FileNotFoundError(
            f"transaction {txn} of {root} does not exist "
            f"(claimed: {list_txns(root)})")
    if os.path.getsize(mp) == 0:
        raise FileNotFoundError(
            f"transaction {txn} of {root} is a crashed claim "
            "(number burned, never finalized)")
    with open(mp, encoding="utf-8") as fh:
        return dict(json.load(fh)["tables"])


def commit_txn(root: str, tables: dict[str, int],
               expected_txn: int) -> int:
    """Pin `tables` ({name: already-committed per-table version}) as
    transaction `expected_txn + 1` IFF no other committer got there
    first (O_CREAT|O_EXCL claim), else raise the retryable
    :class:`VersionConflict`. The pin set is validated against each
    table's own manifest log - pinning a version that does not exist
    (or a crashed per-table claim) is a caller bug surfaced HERE, not
    at some future read."""
    for name, v in tables.items():
        mp = os.path.join(root, name, "_versions", f"v{v:08d}.json")
        if not os.path.exists(mp) or os.path.getsize(mp) == 0:
            raise ValueError(
                f"cannot pin {name}@v{v}: that version is not a "
                "readable commit of the table")
    os.makedirs(_txn_dir(root), exist_ok=True)
    head = max(list_txns(root), default=0)
    if head != expected_txn:
        raise VersionConflict(
            f"expected to extend transaction {expected_txn} of {root} "
            f"but the log is at {head}")
    t = expected_txn + 1
    try:
        fd = os.open(_tpath(root, t), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise VersionConflict(
            f"transaction {t} of {root} was claimed by a concurrent "
            "committer; re-read and retry") from None
    manifest = {"txn": t, "tables": {n: int(v) for n, v in tables.items()}}
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    _publish_latest_txn(root, manifest)
    return t


def _publish_latest_txn(root: str, manifest: dict) -> None:
    """Monotonic _LATEST publish under a short flock section - the
    same shape as versioned.py's pointer swap, so a slow committer of
    txn N can never regress the pointer past a published N+1."""
    import fcntl

    with open(os.path.join(root, "._txn_ptr_lock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if latest_txn(root) >= manifest["txn"]:
                return
            fd, tmp = tempfile.mkstemp(dir=root, prefix="._latest_txn_")
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, os.path.join(root, _LATEST))
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def read_txn_snapshot(spark: SparkSession, root: str,
                      tables: list[str] | None = None,
                      txn: int | None = None) -> dict[str, DataFrame]:
    """A CONSISTENT multi-table snapshot: every requested table read at
    the version the transaction pinned (None = latest transaction;
    `tables` None = every table the transaction names). Raises KeyError
    when the transaction does not pin a requested table - a reader
    asking for a table outside the pin set would otherwise silently
    get non-transactional data."""
    pins = read_txn_manifest(root, txn)
    names = list(pins) if tables is None else list(tables)
    out: dict[str, DataFrame] = {}
    for name in names:
        if name not in pins:
            raise KeyError(
                f"transaction {txn if txn is not None else latest_txn(root)}"
                f" of {root} does not pin table {name!r} "
                f"(pinned: {sorted(pins)})")
        out[name] = read_version(spark, os.path.join(root, name),
                                 pins[name])
    return out


def unpinned_table_versions(root: str) -> dict[str, list[int]]:
    """Per-table versions NO retained transaction pins - the orphans a
    crashed write-then-pin leaves at step 1, plus versions whose txns
    were vacuumed. These are the safe inputs to per-table
    vacuum_versions runs (the txn layer never deletes data itself;
    retention stays a per-table decision)."""
    from .versioned import list_versions

    pinned: dict[str, set[int]] = {}
    for t in list_txns(root):
        try:
            pins = read_txn_manifest(root, t)
        except FileNotFoundError:          # crashed claim
            continue
        for n, v in pins.items():
            pinned.setdefault(n, set()).add(v)
    out: dict[str, list[int]] = {}
    for name in sorted(pinned):
        vs = list_versions(os.path.join(root, name))
        orphans = [v for v in vs if v not in pinned[name]]
        if orphans:
            out[name] = orphans
    return out
