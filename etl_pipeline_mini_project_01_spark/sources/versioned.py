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
exactly Delta's data files. All control-plane IO goes through
sources/fsio.py (VERDICT r9 #2): scheme-less roots use driver-local
``os.*`` exactly as before, while ``file://`` / ``hdfs://`` / ``s3a://``
roots are served by the active session's Hadoop FileSystem client -
the O_CREAT|O_EXCL claim becomes ``FileSystem.create(overwrite=false)``
and the ``os.replace`` pointer swap becomes a FileContext OVERWRITE
rename, with the atomicity grade of the underlying filesystem (atomic
on HDFS/POSIX; see fsio's module docstring for the S3A caveat).
Transaction arbitration comes in two grades (VERDICT r7 #7):

  * `write_version` - NO parent check (two racers may both believe
    they extended the same parent; the pointer is last-writer-wins),
    but each writer gets its OWN dense version number through an
    internally-retried atomic claim, staging under a scratch dir and
    renaming in only after the claim - so concurrent writers can
    never collide on a snapshot directory (the r10 true-concurrency
    battery caught the old final-name TOCTOU doing exactly that).
    The single-pipeline ownership contract, the reference's own
    operating model, now safe under accidental concurrency too.
  * `write_version_cas` - optimistic concurrency: the caller names
    the parent version it built on, and the commit succeeds only if
    it can atomically claim parent+1 (O_CREAT|O_EXCL on the manifest
    - the local-FS equivalent of an object store's conditional PUT).
    Exactly one of N racing committers wins; the others get a
    retryable `VersionConflict` and must re-read + re-stage, which is
    Delta/Iceberg's commit loop verbatim.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import fsio

_VDIR = "_versions"
_LATEST = "_LATEST"


class VersionConflict(Exception):
    """A CAS commit lost the race for its version number: another
    writer committed the same parent's successor first. Retryable -
    re-read the table, re-stage, commit against the new parent."""


def _manifest_dir(root: str) -> str:
    return os.path.join(root, _VDIR)


def latest_version(root: str) -> int:
    """Newest committed version, 0 when the table does not exist."""
    p = os.path.join(root, _LATEST)
    if not fsio.exists(p):
        return 0
    return int(fsio.read_json(p)["version"])


def latest_readable_version(root: str) -> int:
    """Newest version whose manifest has CONTENT - walks the manifest
    log head downward past zero-byte manifests (a CAS committer that
    crashed after claiming its version but before finalizing it), 0
    when nothing readable exists. This can be AHEAD of `_LATEST` when
    a writer crashed after landing manifest content but before the
    pointer swap (ADVICE r8): rebasing writers MUST build on this, not
    on the pointer, or that crashed-but-readable version's rows are
    silently dropped from every future snapshot."""
    d = _manifest_dir(root)
    for v in reversed(list_versions(root)):
        try:
            if fsio.getsize(os.path.join(d, f"v{v:08d}.json")) > 0:
                return v
        except FileNotFoundError:
            continue                   # vacuumed between list and stat
    return 0


def list_versions(root: str) -> list[int]:
    """All committed versions, ascending."""
    d = _manifest_dir(root)
    if not fsio.isdir(d):
        return []
    return sorted(int(f[1:-5]) for f in fsio.listdir(d)
                  if f.startswith("v") and f.endswith(".json"))


def _manifest_with_stats(manifest: dict, stage: str,
                         stats_columns: list[str] | None,
                         spark=None,
                         partition_by: list[str] | None = None) -> dict:
    """Attach Delta-style per-file add-action stats to a manifest:
    {"stats": {"columns": [...], "files": {rel: file-stats}}} (VERDICT
    r11 #3 - the b-tree-index analogue: a selective read prunes files
    from the KB-sized manifest instead of listing/opening every live
    file). Collected from the fully-staged snapshot BEFORE the version
    number is claimed, so the commit protocol and its crash windows
    are untouched.

    Default path (r13, VERDICT r12 #3): TASK-SIDE collection - one
    column-pruned Spark aggregation job over the staged files
    (filestats.stats_via_scan), Delta's per-file stats shape. No
    post-write footer reads, and scheme-qualified roots (hdfs/s3a/
    file) fan out through Spark's own readers instead of degrading to
    a driver-side pyarrow loop. The footer path remains the spark-less
    fallback (stats_for_files is also still the layout-manifest
    collector).

    Partition keys are ALWAYS in the stats set for partitioned
    commits (r14, Delta records partitionValues unconditionally):
    their min=max entries are parsed from the key=value path segments
    the walker already returns - zero data or footer IO - so `prune=`
    on a partition key skips files by default. A partitioned commit
    with NO stats_columns records a partition-only stats block through
    a pure path-parsing pass (no Spark job, no footer reads; per-file
    row counts are unknown there, so the hive NULL partition records
    no entry and conservatively survives null tests)."""
    cols = list(stats_columns or [])
    pkeys = [k for k in (partition_by or []) if k not in cols]
    if not cols and not pkeys:
        return manifest
    from .filestats import (add_partition_stats, collect_stats,
                            stats_via_scan, walk_parquet)

    if not cols:
        files = add_partition_stats(
            {rel: {} for rel, _ in walk_parquet(stage)}, pkeys)
    else:
        all_cols = cols + pkeys
        files = (stats_via_scan(spark, stage, all_cols)
                 if spark is not None
                 else collect_stats(stage, all_cols))
    return dict(manifest,
                stats={"columns": sorted(cols + pkeys),
                       "files": files})


def write_version(df: DataFrame, root: str,
                  partition_by: list[str] | None = None,
                  max_retries: int = 20,
                  stats_columns: list[str] | None = None) -> int:
    """Commit `df` as the next version of the table at `root` and
    return its number. The snapshot is FULLY staged under a
    `._stage_*` scratch dir, then the version number is claimed
    atomically (create-if-absent on its manifest) and the staged dir
    renamed to its final `vNNNNNNNN` name - a claim collision just
    re-reads the log and claims the next number WITHOUT re-staging
    (no parent check: this is the no-expectation grade; callers that
    must know their parent use `write_version_cas`). The old shape
    wrote the snapshot directly at its final name and raced: two
    concurrent writers computed the same max(log)+1, passed
    errorifexists together, and interleaved task files in ONE
    directory - caught by the true-concurrency battery.

    Version numbers come from the MANIFEST LOG, not _LATEST (ADVICE
    r6): a writer that crashed after landing _versions/vN.json but
    before the _LATEST swap leaves _LATEST at N-1 while vN exists -
    the log is the allocation authority; _LATEST is only the readers'
    pointer. Crash windows mirror write_version_cas: before the claim
    -> a stage orphan (age-gated vacuum sweep); between claim and
    content -> a zero-byte manifest (number burned, log allocates
    past it)."""
    import uuid

    fsio.makedirs(_manifest_dir(root))
    stage = os.path.join(root, f"._stage_{uuid.uuid4().hex}")
    w = df.write.mode("errorifexists")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(stage)
    stats_tail = _manifest_with_stats({}, stage, stats_columns,
                                      spark=df.sparkSession,
                                      partition_by=partition_by)
    return _claim_and_finalize(root, stage, max_retries, stats_tail)


def _claim_and_finalize(root: str, stage: str, max_retries: int,
                        stats_tail: dict) -> int:
    """write_version's commit tail, staged-snapshot-agnostic: claim the
    next log number, rename the stage in, finalize the manifest,
    publish the pointer. Shared by the Spark-staged and the
    driver-staged (control-plane) writers - ONE protocol."""
    for _ in range(max_retries):
        v = max(list_versions(root), default=0) + 1
        vdir = f"v{v:08d}"
        mpath = os.path.join(_manifest_dir(root), f"{vdir}.json")
        try:
            claim = fsio.claim_excl(mpath)
        except FileExistsError:
            continue               # number taken: re-read, re-claim
        manifest = {"version": v, "dir": vdir, **stats_tail}
        fsio.rename(stage, os.path.join(root, vdir))
        claim.finalize_json(manifest)
        _publish_latest(root, manifest)
        return v
    fsio.rmtree(stage)
    raise VersionConflict(
        f"gave up allocating a version of {root} after {max_retries} "
        "claim collisions")


def _stage_local_parquet(table, root: str) -> str:
    """Stage a CONTROL-PLANE pyarrow table as a one-file snapshot dir
    driver-side - the staging half of write_version without the Spark
    job. Only for relations that are control-plane sized by
    construction (layout file manifests: k x files_per_cluster rows,
    the same order as the centroid model); data-sized tables keep the
    Spark-staged path."""
    import uuid

    import pyarrow.parquet as papq

    stage = os.path.join(root, f"._stage_{uuid.uuid4().hex}")
    os.makedirs(stage)
    papq.write_table(table, os.path.join(stage, "part-00000.parquet"))
    return stage


def write_version_table(table, root: str, max_retries: int = 20) -> int:
    """:func:`write_version` for a control-plane pyarrow Table: the
    IDENTICAL commit protocol (claim loop -> stage rename -> manifest
    finalize -> monotonic pointer publish; same crash windows, same
    vacuum story) with the snapshot staged driver-side instead of
    through a Spark write job (r15, guide SS1.4/SS5: every layout
    manifest commit paid one single-task Spark job to write KB of
    rows). Scheme-less (driver-local) roots only - scheme-qualified
    roots keep the Spark-staged path, whose writers go through the
    session's Hadoop client."""
    if fsio.has_scheme(root):
        raise ValueError("write_version_table stages driver-side and "
                         "supports scheme-less local roots only")
    fsio.makedirs(_manifest_dir(root))
    stage = _stage_local_parquet(table, root)
    return _claim_and_finalize(root, stage, max_retries, {})


def _publish_latest(root: str, manifest: dict) -> None:
    """Monotonic pointer publish: replace _LATEST only if this
    manifest is newer than the current pointer, under a short flock
    critical section (local fast path; on remote filesystems the lock
    is a documented no-op and the publish is best-effort monotonic -
    fsio.pointer_lock). A slow committer of version N can therefore
    never locally regress the pointer past an already-published N+1."""
    with fsio.pointer_lock(root, "._ptr_lock"):
        if latest_version(root) >= manifest["version"]:
            return
        fsio.write_json_atomic(os.path.join(root, _LATEST), manifest,
                               tmp_prefix="._latest_")


def write_version_cas(df: DataFrame, root: str, expected_version: int,
                      partition_by: list[str] | None = None,
                      stats_columns: list[str] | None = None,
                      manifest_extra: dict | None = None,
                      skip_empty: bool = False) -> int | None:
    """Optimistic-concurrency commit (VERDICT r7 #7): commit `df` as
    `expected_version + 1` IFF no other writer got there first, else
    raise the retryable :class:`VersionConflict`. The arbitration
    point is an O_CREAT|O_EXCL create of the version's manifest file -
    atomic on POSIX, the same shape as a conditional PUT against a
    manifest service - so exactly one of N racing committers wins.

    Commit order keeps every crash window recoverable:
      1. the snapshot is FULLY staged under a `._stage_*` scratch dir
         (a crash leaves an orphan, swept by vacuum - never a
         half-readable version);
      2. the manifest file is claimed with O_EXCL (losers conflict
         HERE, before any destructive step);
      3. the staged dir is renamed to its final `vNNNNNNNN` name;
      4. the manifest content lands on the claimed fd (a crash between
         3 and 4 leaves a zero-byte manifest: the version number is
         burned but `read_version` reports it as a crashed commit and
         the log keeps allocating past it);
      5. _LATEST advances via the monotonic publish.

    `manifest_extra` merges additional fields into the manifest (the
    differential sink records its {"delta": {"keys": [...]}} marker
    this way); the protocol-owned fields are protected.

    `skip_empty=True` (r14, the streaming sink's empty-batch guard):
    a row count rides the staging write as an Observation - free, the
    write executes every row anyway - and a zero-row `df` aborts the
    commit BEFORE the claim (stage removed, None returned, no version
    burned). The sink previously asked `df.isEmpty()` up front, which
    executed the whole batch plan a second time just to answer a
    question the write already knows (guide SS1.4's count-probe trap,
    applied to a sink)."""
    import uuid

    if manifest_extra and {"version", "dir", "stats"} & set(manifest_extra):
        raise ValueError("manifest_extra may not override the "
                         "protocol-owned fields version/dir/stats")
    fsio.makedirs(_manifest_dir(root))
    head = max(list_versions(root), default=0)
    if head != expected_version:
        raise VersionConflict(
            f"expected to extend version {expected_version} of {root} "
            f"but the log is at {head}")
    v = expected_version + 1
    vdir = f"v{v:08d}"
    stage = os.path.join(root, f"._stage_{uuid.uuid4().hex}")
    obs = None
    if skip_empty:
        from pyspark.sql import Observation
        from pyspark.sql import functions as _F

        obs = Observation()
        df = df.observe(obs, _F.count(_F.lit(1)).alias("rows"))
    w = df.write.mode("errorifexists")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(stage)
    if obs is not None and int(obs.get["rows"]) == 0:
        fsio.rmtree(stage)
        return None
    # footer-stat collection runs on the STAGED tree, before the claim:
    # the claim->finalize window (a crash there burns the number as a
    # zero-byte manifest) stays as short as the stat-less protocol's
    manifest = _manifest_with_stats(
        {"version": v, "dir": vdir, **(manifest_extra or {})},
        stage, stats_columns, spark=df.sparkSession,
        partition_by=partition_by)
    mpath = os.path.join(_manifest_dir(root), f"{vdir}.json")
    try:
        claim = fsio.claim_excl(mpath)
    except FileExistsError:
        fsio.rmtree(stage)
        raise VersionConflict(
            f"version {v} of {root} was claimed by a concurrent "
            "committer; re-read and retry") from None
    fsio.rename(stage, os.path.join(root, vdir))
    claim.finalize_json(manifest)
    _publish_latest(root, manifest)
    return v


def write_version_cas_table(table, root: str,
                            expected_version: int) -> int:
    """:func:`write_version_cas` for a control-plane pyarrow Table:
    identical arbitration (O_EXCL manifest claim = the conditional
    PUT; losers get the retryable VersionConflict BEFORE any
    destructive step) and identical commit order/crash windows, with
    the snapshot staged driver-side instead of through a Spark job
    (see write_version_table). Scheme-less local roots only; no
    stats/skip_empty/manifest_extra - the layout-manifest commits this
    serves carry their stats IN the rows."""
    if fsio.has_scheme(root):
        raise ValueError("write_version_cas_table stages driver-side "
                         "and supports scheme-less local roots only")
    fsio.makedirs(_manifest_dir(root))
    head = max(list_versions(root), default=0)
    if head != expected_version:
        raise VersionConflict(
            f"expected to extend version {expected_version} of {root} "
            f"but the log is at {head}")
    v = expected_version + 1
    vdir = f"v{v:08d}"
    stage = _stage_local_parquet(table, root)
    manifest = {"version": v, "dir": vdir}
    mpath = os.path.join(_manifest_dir(root), f"{vdir}.json")
    try:
        claim = fsio.claim_excl(mpath)
    except FileExistsError:
        fsio.rmtree(stage)
        raise VersionConflict(
            f"version {v} of {root} was claimed by a concurrent "
            "committer; re-read and retry") from None
    fsio.rename(stage, os.path.join(root, vdir))
    claim.finalize_json(manifest)
    _publish_latest(root, manifest)
    return v


def read_version(spark: SparkSession, root: str,
                 version: int | None = None,
                 prune: tuple | list | None = None) -> DataFrame:
    """Time travel: the table AS OF `version` (None = latest). Raises
    FileNotFoundError for never-committed or vacuumed versions.

    `prune` is an optional conjunction of simple predicates, each a
    (column, op, value) tuple with op in filestats.OPS ("=", "<",
    "<=", ">", ">=", "between" - value then a (lo, hi) pair; "in" -
    value an iterable of members, the point-lookup disjunction;
    "is_null" / "is_not_null" - value ignored, may be omitted
    entirely: ("col", "is_null") works, pruning on the manifest's
    exact per-file null counts). A conjunction member may itself be a
    LIST of such tuples, meaning their DISJUNCTION (r13: CNF -
    `[("a", "<", 5), [("b", "=", 1), ("c", ">", 9)]]` is
    a < 5 AND (b = 1 OR c > 9); a disjunctive clause drops a file only
    when EVERY disjunct provably excludes it). When the
    manifest carries add-action stats (committed with
    `stats_columns=`), files whose recorded [min, max] provably
    exclude every predicate are DROPPED FROM THE SCAN's file list -
    Delta-style data skipping, the manifest-level lever parquet
    row-group skipping can't reach (an excluded file is never listed,
    opened, or footer-read at query time). The predicates are ALSO
    applied as a DataFrame filter, so the result is always exactly
    `read_version(...).filter(...)` - pruning is a plan optimization,
    never a semantics change; stats-less manifests (or stats-less
    columns) just skip straight to the filtered full scan."""
    if version is None:
        version = latest_version(root)
    mpath = os.path.join(_manifest_dir(root), f"v{version:08d}.json")
    if not fsio.exists(mpath):
        raise FileNotFoundError(
            f"version {version} of {root} does not exist "
            f"(committed: {list_versions(root)})")
    if fsio.getsize(mpath) == 0:
        raise FileNotFoundError(
            f"version {version} of {root} is a crashed CAS commit "
            "(manifest claimed, never finalized)")
    manifest = fsio.read_json(mpath)
    preds = _norm_prune(prune)
    if manifest.get("delta"):
        return _read_delta_chain(spark, root, manifest, preds)
    snap = os.path.join(root, manifest["dir"])
    if not preds:
        return spark.read.parquet(snap)
    df = _pruned_scan(spark, snap, manifest, preds)
    for clause in preds:
        df = df.filter(_clause_column(clause))
    return df


def _delta_chain(root: str, head: dict) -> list[dict]:
    """Manifests of `head`'s merge-on-read chain, newest first: the
    head, every delta below it, and the first FULL snapshot reached
    (the base), if any. Burned zero-byte CAS claims are skipped (they
    contributed no rows); a MISSING manifest below a delta breaks the
    chain loudly - vacuum_versions protects live chains, so this only
    fires on manual manifest deletion."""
    keys = list(head["delta"]["keys"])
    chain = [head]
    v = head["version"] - 1
    while chain[-1].get("delta") and v >= 1:
        mpath = os.path.join(_manifest_dir(root), f"v{v:08d}.json")
        if not fsio.exists(mpath):
            raise FileNotFoundError(
                f"delta chain of {root} version {head['version']} is "
                f"broken at version {v} (manifest missing) - cannot "
                "resolve merge-on-read")
        if fsio.getsize(mpath) == 0:
            v -= 1
            continue
        man = fsio.read_json(mpath)
        if man.get("delta") and list(man["delta"]["keys"]) != keys:
            raise ValueError(
                f"delta chain of {root} mixes upsert keys: version "
                f"{head['version']} uses {keys}, version {v} uses "
                f"{man['delta']['keys']}")
        chain.append(man)
        v -= 1
    return chain


def _read_delta_chain(spark: SparkSession, root: str, head: dict,
                      preds: list) -> DataFrame:
    """MERGE-ON-READ resolution of a differential upsert chain
    (VERDICT r13 #2): union every member snapshot tagged with its
    version, keep each key's rows from the NEWEST version that
    carries the key (latest-wins, the upsert_latest window shape at
    operators/scd.py:167 generalized to whole-version precedence),
    drop the tags. Reference analogue: the cumulative effect of
    per-run ON CONFLICT DO UPDATE upserts
    (/root/reference/src/loader/bronze_loader.py:143-188).

    One shuffle on the upsert keys over |chain rows| - with periodic
    compaction (compact_latest) the chain is base + few deltas, so
    the resolution cost tracks |table| + |recent batches|, never
    |table| x |chain|. Window partitionBy groups NULL keys into one
    partition, matching the rewrite path's eqNullSafe anti-join.

    File-level pruning inside a chain is applied ONLY for clauses
    whose every column is a merge key: all rows sharing a key agree
    on key-column values, so a key-pruned row (winner or shadowed
    loser) could never survive the post-resolution filter - whereas
    pruning on a NON-key column could drop a key's newest version
    pre-resolution and resurrect its stale row. Non-key clauses run
    as plain post-resolution filters."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    chain = _delta_chain(root, head)
    keys = list(head["delta"]["keys"])
    key_set = set(keys)

    def _clause_cols(clause) -> set:
        if isinstance(clause, tuple):
            return {clause[0]}
        return {a[0] for a in clause}

    key_preds = [c for c in preds if _clause_cols(c) <= key_set]
    union = None
    for man in chain:
        snap = os.path.join(root, man["dir"])
        df = (_pruned_scan(spark, snap, man, key_preds)
              if key_preds else spark.read.parquet(snap))
        bad = {"__v", "__maxv"} & set(df.columns)
        if bad:
            raise ValueError(
                f"columns {sorted(bad)} are reserved by the delta-chain "
                "resolver; rename them before committing differential "
                "versions")
        df = df.withColumn("__v", F.lit(man["version"]))
        union = df if union is None else union.unionByName(df)
    w = Window.partitionBy(*keys)
    out = (union.withColumn("__maxv", F.max("__v").over(w))
           .filter(F.col("__v") == F.col("__maxv"))
           .drop("__v", "__maxv"))
    for clause in preds:
        out = out.filter(_clause_column(clause))
    return out


def compact_latest(spark: SparkSession, root: str,
                   partition_by: list[str] | None = None,
                   stats_columns: list[str] | None = None,
                   max_retries: int = 5) -> int:
    """Fold the latest delta chain into a FULL snapshot committed as a
    new version (the ivf_layout.compact_layout_generation shape for
    versioned tables): readers switch from merge-on-read over the
    chain to a plain single-snapshot scan, and vacuum can then reclaim
    the folded chain (keep_last=1 after compaction drops every delta).
    Returns the compacted version number - or the current head
    unchanged when it is already a full snapshot (nothing to fold).
    Runs the optimistic CAS loop: a concurrent delta commit during the
    fold just re-reads and re-folds."""
    for _ in range(max_retries):
        head = latest_readable_version(root)
        if head == 0:
            raise FileNotFoundError(f"nothing committed at {root}")
        man = fsio.read_json(
            os.path.join(_manifest_dir(root), f"v{head:08d}.json"))
        if not man.get("delta"):
            return head
        resolved = read_version(spark, root, head)
        try:
            return write_version_cas(
                resolved, root,
                expected_version=max(list_versions(root), default=0),
                partition_by=partition_by, stats_columns=stats_columns)
        except VersionConflict:
            continue
    raise VersionConflict(
        f"gave up compacting {root} after {max_retries} conflicts")


def _norm_prune(prune) -> list[tuple]:
    """Normalize `prune` into CNF clause form: a list whose elements
    are either a 3-tuple atom (col, op, value) - the null-test ops may
    omit the value - or a LIST of such atoms, meaning their DISJUNCTION
    (r13: conjunction-of-disjunctions covers every boolean combination
    of simple predicates; a clause's file-level verdict is "keep if ANY
    disjunct might match", still conservative)."""
    if prune is None:
        return []
    if _is_atom(prune):
        return [_norm_atom(prune)]
    out: list = []
    for p in prune:
        if _is_atom(p):
            out.append(_norm_atom(p))
        else:
            disj = [_norm_atom(a) for a in p]
            if not disj:
                raise ValueError("empty OR-group in prune: a disjunction "
                                 "of nothing matches nothing - filter "
                                 "explicitly instead")
            out.append(disj)
    return out


def _is_atom(p) -> bool:
    return (isinstance(p, (tuple, list)) and len(p) in (2, 3)
            and isinstance(p[0], str))


def _norm_atom(p) -> tuple:
    t = tuple(p)
    return t if len(t) == 3 else (t[0], t[1], None)


def _clause_column(clause):
    """Spark filter Column for one CNF clause (atom or disjunction)."""
    if isinstance(clause, list):
        out = _pred_column(*clause[0])
        for a in clause[1:]:
            out = out | _pred_column(*a)
        return out
    return _pred_column(*clause)


def _pred_column(col: str, op: str, value):
    from pyspark.sql import functions as F

    c = F.col(col)
    if op == "between":
        return (c >= value[0]) & (c <= value[1])
    if op == "in":
        return c.isin(list(value))
    if op == "is_null":
        return c.isNull()
    if op == "is_not_null":
        return c.isNotNull()
    return {"=": c == value, "<": c < value, "<=": c <= value,
            ">": c > value, ">=": c >= value}[op]


def pruned_files(manifest: dict, preds: list[tuple]
                 ) -> tuple[list[str], int] | None:
    """(surviving relative paths, total file count) under the
    manifest's add-action stats, or None when the manifest carries no
    stats (callers fall back to the full directory scan). Exposed for
    the file-count guards in tests and the scale curve."""
    stats = manifest.get("stats")
    if not stats:
        return None
    from .filestats import clause_survives

    files = stats.get("files", {})
    kept = [rel for rel, st in sorted(files.items())
            if all(clause_survives(st, cl) for cl in preds)]
    return kept, len(files)


def _pruned_scan(spark: SparkSession, snap: str, manifest: dict,
                 preds: list[tuple]) -> DataFrame:
    """Scan exactly the stat-surviving files (basePath keeps partition
    columns intact for partitioned snapshots). An empty survivor set
    short-circuits to a zero-row frame with the snapshot's schema."""
    res = pruned_files(manifest, preds)
    if res is None:
        return spark.read.parquet(snap)
    kept, total = res
    if len(kept) == total:
        return spark.read.parquet(snap)
    if not kept:
        return spark.read.parquet(snap).limit(0)
    return (spark.read.option("basePath", snap)
            .parquet(*[os.path.join(snap, rel) for rel in kept]))


def vacuum_versions(root: str, keep_last: int = 2,
                    stage_retention_sec: float = 24 * 3600.0
                    ) -> list[int]:
    """Drop all but the newest `keep_last` snapshots (and any orphan
    snapshot directories from crashed writers - present on disk,
    absent from the manifest log). Returns the removed version
    numbers. The manifest is removed BEFORE its directory so a crash
    mid-vacuum leaves an orphan (re-vacuumable), never a manifest
    pointing at nothing.

    `._stage_*` scratch dirs are swept ONLY when older than
    `stage_retention_sec` by mtime (ADVICE r8, Delta-style retention):
    they are also the LIVE staging dirs of in-flight write_version_cas
    commits - the exact multi-writer setting the module advertises - so
    an unconditional sweep racing an in-flight commit would kill it
    (burned version) or, in the rmtree-vs-rename window, let a
    partially-deleted stage dir be renamed into place as a committed
    TORN snapshot. A stage dir's mtime refreshes while Spark tasks
    commit files into it; one untouched for the retention period is a
    crashed writer's orphan. Set 0.0 to force-sweep when no writer can
    be live (single-owner maintenance).

    keep_last must be >= 1 (ADVICE r6): retaining zero snapshots would
    leave _LATEST referencing a deleted version, so latest_version()
    would report a vacuumed table and read_version() would raise
    FileNotFoundError instead of signaling emptiness - an empty table
    is expressed by committing an empty DataFrame, not by vacuuming
    everything.

    The _LATEST version is always treated as live (ADVICE r7): after
    a crashed commit the log can be AHEAD of _LATEST (vN.json exists,
    _LATEST still at N-1), and keeping only the log tail would delete
    the snapshot readers resolve - the exact wedge the keep_last>=1
    guard exists to prevent.

    `keep_last` counts READABLE versions: a crashed zero-byte claim
    can never consume a retention slot and evict a readable snapshot.
    A kept DIFFERENTIAL version additionally protects its whole
    merge-on-read chain (base + intermediate deltas, r14) - so a delta
    chain is reclaimed by first folding it (compact_latest) and then
    vacuuming with keep_last=1, never by partial deletion that would
    wedge a promised-kept version.
    Zero-byte claims outside the kept set are themselves age-gated by
    `stage_retention_sec` (a fresh one may be an IN-FLIGHT CAS
    committer between its claim and its finalize; removing it would
    let a rival claim the same number). A swept crashed claim's
    number MAY be re-allocated when no later version exists - safe,
    because the number never published content and the age gate says
    no live claimant holds it."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = list_versions(root)

    def _msize(v: int) -> int:
        try:
            return fsio.getsize(
                os.path.join(_manifest_dir(root), f"v{v:08d}.json"))
        except FileNotFoundError:
            return -1                      # rival vacuum removed it
    readable = [v for v in versions if _msize(v) > 0]
    keep = set(readable[-keep_last:]) | {latest_version(root)}
    # Delta-chain closure (r14): a kept DIFFERENTIAL version is only
    # readable together with every chain member below it - dropping
    # its base (or a middle delta) would break merge-on-read for a
    # version the retention policy promised to keep. An already-broken
    # chain protects nothing extra (the read fails either way).
    closure: set[int] = set()
    for v in keep:
        mp = os.path.join(_manifest_dir(root), f"v{v:08d}.json")
        try:
            if fsio.getsize(mp) == 0:
                continue
            man = fsio.read_json(mp)
            if man.get("delta"):
                closure |= {m["version"] for m in _delta_chain(root, man)}
        except (FileNotFoundError, ValueError, KeyError):
            continue
    keep |= closure
    import time as _time

    _now = _time.time()
    drop = []
    for v in versions:
        if v in keep:
            continue
        vdir = f"v{v:08d}"
        mp = os.path.join(_manifest_dir(root), f"{vdir}.json")
        try:
            if (fsio.getsize(mp) == 0
                    and _now - fsio.getmtime(mp) < stage_retention_sec):
                continue                   # possibly in-flight claim
            fsio.remove(mp)
        except FileNotFoundError:
            continue                       # a rival vacuum got it first
        fsio.rmtree(os.path.join(root, vdir))
        drop.append(v)
    import time

    for entry in fsio.scandir(root):
        full = os.path.join(root, entry.name)
        if (entry.name.startswith("v") and entry.is_dir
                and entry.name[1:].isdigit()):
            # Orphan snapshot dirs (crash-mid-vacuum debris: manifest
            # removed, dir survived). Ownership is re-checked at SWEEP
            # time against the manifest file itself - a commit claims
            # its manifest BEFORE the stage->vNNN rename, so a dir
            # whose manifest exists (any size) is a live commit; a
            # pre-computed kept set would go stale against exactly
            # that race and rmtree a just-committed snapshot.
            if fsio.exists(os.path.join(_manifest_dir(root),
                                        f"{entry.name}.json")):
                continue
            fsio.rmtree(full)
        elif entry.name.startswith("._stage_") and entry.is_dir:
            # crashed CAS commits stage here before claiming a version;
            # age-gate so a LIVE committer's stage dir survives (the
            # scandir mtime may itself race a concurrent commit's
            # rename - a vanished entry is simply skipped by rmtree's
            # ignore-errors semantics)
            if time.time() - entry.mtime >= stage_retention_sec:
                fsio.rmtree(full)
    return drop
