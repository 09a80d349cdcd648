"""Versioned parquet tables: snapshot isolation + time travel over the
engine's own storage layer (closes the second half of the
Delta/Iceberg TODO in SCALE.md - MERGE's seam lives in
table_format.py; this is the time-travel half, format-free).

Layout (a deliberately minimal Delta-log shape):

    table_root/
      _versions/v00000001.json   one manifest per committed version
      _versions/v00000002.json     {"version": n, "dir": "v00000002"}
      _LATEST                    JSON copy of the newest manifest,
                                 swapped in with os.replace (atomic on
                                 POSIX) - readers never see a partial
                                 commit
      v00000001/...parquet       immutable snapshot directories
      v00000002/...parquet

Writers stage the snapshot directory FULLY before the manifest lands,
so a crash mid-write leaves an orphan directory (cleaned by `vacuum`)
and never a readable-but-partial table. Readers resolve `_LATEST` (or
a pinned version) to one immutable directory - concurrent overwrites
cannot disturb an in-flight read, unlike the rename dance in
`atomic_overwrite` where a reader holding the old path can lose files
mid-scan. Version numbers are dense integers (no wall-clock in the
commit protocol: deterministic, replayable).

At 100 TB the same protocol works with a manifest service or object
store (conditional PUT of _LATEST); the per-version directories are
exactly Delta's data files, minus transaction arbitration - LAST
WRITER WINS here, which is the documented contract (single-pipeline
ownership, the reference's own operating model).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_VDIR = "_versions"
_LATEST = "_LATEST"


def _manifest_dir(root: str) -> str:
    return os.path.join(root, _VDIR)


def latest_version(root: str) -> int:
    """Newest committed version, 0 when the table does not exist."""
    p = os.path.join(root, _LATEST)
    if not os.path.exists(p):
        return 0
    with open(p, encoding="utf-8") as fh:
        return int(json.load(fh)["version"])


def list_versions(root: str) -> list[int]:
    """All committed versions, ascending."""
    d = _manifest_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[1:-5]) for f in os.listdir(d)
                  if f.startswith("v") and f.endswith(".json"))


def write_version(df: DataFrame, root: str,
                  partition_by: list[str] | None = None) -> int:
    """Commit `df` as the next version of the table at `root` and
    return its number. The snapshot directory is fully written before
    any manifest exists; the _LATEST swap is a single os.replace."""
    os.makedirs(_manifest_dir(root), exist_ok=True)
    # Next version from the MANIFEST LOG, not _LATEST (ADVICE r6): a
    # writer that crashed after landing _versions/vN.json but before
    # the _LATEST swap leaves _LATEST at N-1 while vN exists - deriving
    # from _LATEST would recompute v=N and fail forever on
    # errorifexists. The log is the allocation authority; _LATEST is
    # only the readers' pointer (a crashed commit's snapshot stays
    # invisible to `read_version(None)` until the next commit, but its
    # fully-written dir+manifest remain readable by explicit version).
    v = max(list_versions(root), default=0) + 1
    vdir = f"v{v:08d}"
    w = df.write.mode("errorifexists")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(os.path.join(root, vdir))
    manifest = {"version": v, "dir": vdir}
    mpath = os.path.join(_manifest_dir(root), f"{vdir}.json")
    with open(mpath, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
    fd, tmp = tempfile.mkstemp(dir=root, prefix="._latest_")
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(root, _LATEST))
    return v


def read_version(spark: SparkSession, root: str,
                 version: int | None = None) -> DataFrame:
    """Time travel: the table AS OF `version` (None = latest). Raises
    FileNotFoundError for never-committed or vacuumed versions."""
    if version is None:
        version = latest_version(root)
    mpath = os.path.join(_manifest_dir(root), f"v{version:08d}.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"version {version} of {root} does not exist "
            f"(committed: {list_versions(root)})")
    with open(mpath, encoding="utf-8") as fh:
        manifest = json.load(fh)
    return spark.read.parquet(os.path.join(root, manifest["dir"]))


def vacuum_versions(root: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest `keep_last` snapshots (and any orphan
    snapshot directories from crashed writers - present on disk,
    absent from the manifest log). Returns the removed version
    numbers. The manifest is removed BEFORE its directory so a crash
    mid-vacuum leaves an orphan (re-vacuumable), never a manifest
    pointing at nothing.

    keep_last must be >= 1 (ADVICE r6): retaining zero snapshots would
    leave _LATEST referencing a deleted version, so latest_version()
    would report a vacuumed table and read_version() would raise
    FileNotFoundError instead of signaling emptiness - an empty table
    is expressed by committing an empty DataFrame, not by vacuuming
    everything."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = list_versions(root)
    drop = versions[:-keep_last]
    for v in drop:
        vdir = f"v{v:08d}"
        os.remove(os.path.join(_manifest_dir(root), f"{vdir}.json"))
        shutil.rmtree(os.path.join(root, vdir), ignore_errors=True)
    kept = {f"v{v:08d}" for v in list_versions(root)}
    for entry in os.listdir(root):
        if (entry.startswith("v") and entry not in kept
                and os.path.isdir(os.path.join(root, entry))
                and entry[1:].isdigit()):
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
    return drop
