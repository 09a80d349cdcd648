"""Per-file column statistics for manifest add-actions (VERDICT r11 #3).

Delta/Iceberg record (min, max, null_count) per data file in the commit
log so a reader can drop files whose range excludes a predicate WITHOUT
opening them - the log-level analogue of parquet's own row-group
skipping, and the engine's mapping of the reference's 25+ b-tree
indexes (SURVEY.md SS4.1: "parquet min/max skipping + partition
pruning"; reference models/bronze/02:90-94, models/silver/02:26-27).
This module is the shared stats layer: `sources/versioned.py` embeds
its output in version manifests, `operators/ivf_layout.py` in layout
manifest rows.

Two collectors, one output contract (field-identical, pytest-pinned):
  * :func:`stats_via_scan` (r13, the DEFAULT for versioned commits):
    one column-pruned Spark aggregation job over the staged snapshot,
    grouped by `_metadata.file_path` - task-side, scheme-agnostic
    (executors read through Spark's own readers), no footer IO;
  * :func:`collect_stats` / :func:`file_stats` (the footer path):
    parquet footer row-group statistics via pyarrow - metadata-sized
    IO, faster on local disks, the spark-less fallback and the
    layout-manifest collector. On scheme-qualified roots the bytes
    come through fsio (whole-object read, driver-side).

Conservatism contract - a file may always be KEPT spuriously, never
dropped wrongly:
  * a column missing from a file records no stats and survives every
    predicate; one lacking usable min/max on ANY row group (absent
    footer bounds, NaN pollution, or an order-unsafe canonical type:
    bytes, Decimal, bool) records its exact null counts ONLY - range
    predicates keep the file, IS [NOT] NULL can still prune;
  * an all-null column records nulls only; it survives everything
    (NULL never matches a comparison, but the planner stays out of
    three-valued-logic business - the query's own filter handles it);
  * a type mismatch between predicate value and stored stats compares
    as "don't know" -> keep.
"""

from __future__ import annotations

import datetime
import io
import os
import re

from . import fsio

#: min/max survive JSON round-tripping AND compare correctly in their
#: canonical form for exactly these types. datetimes canonicalize to
#: naive-UTC ISO strings (lexicographic == chronological for a fixed
#: format); Decimal and bytes do NOT (str(Decimal) sorts "9" > "10")
#: and are deliberately excluded.
_ORDERED = (bool, int, float, str, datetime.date, datetime.datetime)


def _canon(v):
    """JSON-safe, order-preserving canonical form, or None if the value
    has no such form (-> no stats recorded)."""
    import math

    if isinstance(v, bool) or v is None:
        return None                      # bool min/max: useless, skip
    if isinstance(v, float):
        # NaN-polluted footer stats are meaningless as bounds (parquet
        # writers disagree on whether NaN enters min/max) - record no
        # stats, keep the file. Spark orders NaN LARGEST, so a file
        # whose stats a NaN-aware writer produced could otherwise
        # understate its range.
        return None if math.isnan(v) else v
    if isinstance(v, (int, str)):
        return v
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return None


def canon_pred_value(v):
    """Canonicalize a PREDICATE value the same way stored stats were -
    comparisons only make sense inside one canonical space."""
    return _canon(v)


#: Canonical temporal string forms: a bare date ('2024-02-01') vs a
#: datetime ('2024-02-01 00:00:00[.ffffff]'). Dates and datetimes
#: canonicalize into DIFFERENT granularities, and lexicographic
#: comparison across them is wrong at exactly midnight ('2024-02-01'
#: < '2024-02-01 00:00:00'): a date predicate on a timestamp column
#: wrongly pruned files whose matches sit at midnight (ADVICE r12).
#: :func:`_temporal_align` maps both granularities into the datetime
#: space (bare date -> midnight, matching Spark's date->timestamp
#: cast) before any bound comparison.
_DATE_FORM = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TEMPORAL_FORM = re.compile(
    r"^\d{4}-\d{2}-\d{2}( \d{2}:\d{2}:\d{2}(\.\d+)?)?$")


def _midnight(s):
    return s + " 00:00:00" if _DATE_FORM.match(s) else s


def _temporal_align(v, mn, mx):
    """Align a canonicalized date/datetime predicate value and the
    stored [min, max] into one granularity space. Returns
    (v, mn, mx, v_ext, mn_ext) with bare dates extended to midnight
    (the flags say WHICH side was), or None when the stored
    bounds don't look temporal at all (don't-know -> keep: e.g. a
    date predicate against a plain string column's stats).

    The flags matter for STRICT ops (ADVICE r13): midnight extension
    collapses the lexicographic STRICT inequality
    '2024-02-01' < '2024-02-01 00:00:00' into equality, so a STRING
    column holding date/datetime-shaped values could be wrongly pruned
    at exactly the granularity boundary. The hazard is PER-OPERAND
    (pinned case-by-case in test_data_skipping):
      * '<' keeps iff min <lex v; the collapse hides a match only when
        MIN was the extended side (bare-date min, v its midnight - the
        bare-date row itself sorts strictly below v). When v was the
        extended one, min at midnight really does exclude every row,
        strictness stays exact - including the timestamp-column
        date-predicate case the r12 fix made precise.
      * '>' keeps iff max >lex v; symmetric logic - only V's extension
        hides a match (max at midnight sorts strictly above the bare
        v). A bare-date max below a midnight v excludes correctly.
    Non-strict ops and '=' are unaffected: extension maps a bare date
    to the smallest same-day full form, which preserves <= / >= within
    the temporal-form string space. Callers relax '<' to <= when
    `mn_ext`, '>' to >= when `v_ext`."""
    if not (isinstance(mn, str) and isinstance(mx, str)
            and _TEMPORAL_FORM.match(mn) and _TEMPORAL_FORM.match(mx)):
        return None
    av, amn = _midnight(v), _midnight(mn)
    return av, amn, _midnight(mx), av != v, amn != mn


def file_stats(path: str, columns: list[str]) -> dict | None:
    """Footer stats for one parquet file:
    {"rows": n, "cols": {col: {"min": .., "max": .., "nulls": n}}}.
    A column appears with min/max only when EVERY row group carries
    them (and they canonicalize); otherwise with nulls-only or not at
    all. Returns None when the footer is unreadable (keep the file)."""
    import pyarrow.parquet as pq

    try:
        if fsio.has_scheme(path):
            md = pq.ParquetFile(io.BytesIO(fsio.read_bytes(path))).metadata
        else:
            md = pq.ParquetFile(path).metadata
    except Exception:
        return None
    want = set(columns)
    # column-chunk index by name (physical columns only: partition-key
    # columns live in the directory name, not the footer)
    name_to_idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
    cols: dict[str, dict] = {}
    for c in want & set(name_to_idx):
        idx = name_to_idx[c]
        mn = mx = None
        nulls = 0
        ok = True
        # "nulls" is recorded only when EVERY row group reported a
        # null_count: a partial sum UNDERCOUNTS, and IS [NOT] NULL
        # pruning rides on the count being exact (an undercounted 0
        # would wrongly prune a file that does hold NULLs).
        nulls_exact = True
        bounds_ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None:
                ok = False
                break
            if st.null_count is None:
                nulls_exact = False
            else:
                nulls += st.null_count
            all_null = (st.null_count is not None
                        and st.null_count == md.row_group(rg).num_rows)
            if all_null:
                continue                 # contributes no min/max
            # unusable BOUNDS (absent min/max, or a canonical form
            # that doesn't sort like the value: NaN, bytes, Decimal,
            # bool) no longer discard the whole column - the exact
            # null counts keep accumulating and land as a nulls-only
            # entry, so IS [NOT] NULL pruning still works (r13: also
            # what keeps the footer path field-identical to the
            # task-side scan collector)
            if not st.has_min_max:
                bounds_ok = False
                continue
            try:
                raw_mn, raw_mx = st.min, st.max
            except Exception:
                # pyarrow refuses to DECODE stats for some physical/
                # logical combos even when has_min_max is True
                # (ArrowNotImplementedError on Decimal-over-INT64, r13
                # review matrix) - unusable bounds, exact null counts
                # still accumulate
                bounds_ok = False
                continue
            cmn, cmx = _canon(raw_mn), _canon(raw_mx)
            if cmn is None or cmx is None:
                bounds_ok = False
                continue
            mn = cmn if mn is None or cmn < mn else mn
            mx = cmx if mx is None or cmx > mx else mx
        if not ok:
            continue
        entry: dict = {"nulls": nulls} if nulls_exact else {}
        if bounds_ok and mn is not None:
            entry["min"] = mn
            entry["max"] = mx
        if entry:
            cols[c] = entry
    return {"rows": md.num_rows, "cols": cols}


#: File count above which footer-stat collection fans out to the
#: executors instead of looping on the driver. MEASURED before tuning
#: (local[32], 800 x 10k-row files): a LOCAL footer read is ~0.1 ms
#: (0.07 s sequential for all 800) while the fan-out pays ~0.25 s of
#: warm job overhead - so on a local disk the driver loop wins into
#: the tens of thousands of files, and the breakeven sits near this
#: threshold. The fan-out's real target is a network-attached shared
#: filesystem (NFS/Lustre/HDFS-mount) where each footer is an IO
#: round-trip: at 10 ms/footer a k ~ 1e5 layout commit is ~17 min
#: sequential vs seconds fanned out. Scheme-qualified (hdfs://s3a://)
#: paths stay driver-side regardless - executors' plain pyarrow has no
#: Hadoop client - which a production deployment sidesteps by
#: collecting stats task-side during the write, like Delta's writers.
DISTRIBUTE_THRESHOLD = 4096


def stats_for_files(pairs: list[tuple], columns: list[str],
                    spark=None,
                    distribute_threshold: int = DISTRIBUTE_THRESHOLD
                    ) -> dict:
    """{key: file_stats(...) or {}} for (key, full-path) pairs - the
    shared collection core of version-manifest and layout-manifest
    commits. DISTRIBUTED over the executors (one RDD of paths, footer
    reads task-side - Delta collects its add-action stats task-side
    for the same reason) when a session is given, the batch exceeds
    `distribute_threshold`, and the paths are scheme-less (executors
    read the shared filesystem directly; scheme-qualified paths go
    through the driver's Hadoop client, so they stay driver-side)."""
    cols = list(columns)
    if (spark is not None and len(pairs) > distribute_threshold
            and not any(fsio.has_scheme(p) for _, p in pairs)):
        slices = min(64, max(2, len(pairs) // 32))
        res = (spark.sparkContext.parallelize(list(pairs), slices)
               .map(lambda kp: (kp[0], file_stats(kp[1], cols) or {}))
               .collect())
        return dict(res)
    return {k: (file_stats(p, cols) or {}) for k, p in pairs}


def walk_parquet(snapshot_dir: str) -> list[tuple[str, str]]:
    """(relative-path, full-path) of every visible data file under
    `snapshot_dir`, recursive (partitioned snapshots keep their
    `key=value/` segments in the relative path; underscore/dot-
    prefixed names are hidden). THE file-visibility rule both
    collectors share - one walker, so the footer and scan paths can
    never disagree on the file set."""
    pairs: list[tuple[str, str]] = []

    def walk(d: str, rel: str) -> None:
        for entry in sorted(fsio.scandir(d), key=lambda e: e.name):
            full = os.path.join(d, entry.name)
            r = f"{rel}{entry.name}"
            if entry.is_dir:
                if not entry.name.startswith(("_", ".")):
                    walk(full, f"{r}/")
            elif (entry.name.endswith(".parquet")
                    and not entry.name.startswith(("_", "."))):
                pairs.append((r, full))

    walk(snapshot_dir, "")
    return pairs


#: Hive's directory spelling of a NULL partition value.
_NULL_PART = "__HIVE_DEFAULT_PARTITION__"

#: Integer partition-value literal, int64-ranged (18 digits keeps every
#: match inside int64, so Python's parse agrees with Spark's).
_INT_FORM = re.compile(r"^-?\d{1,18}$")


def add_partition_stats(files: dict[str, dict],
                        columns: list[str]) -> dict[str, dict]:
    """Augment a {relative-path: file-stats} mapping with min=max
    entries for hive partition-key columns parsed from the `key=value`
    path segments (VERDICT r13 #3 - Delta records `partitionValues`
    per add action and treats them as min=max). Partition columns have
    no physical chunk, so both collectors previously recorded NOTHING
    for them and `prune=` on a partition key dropped no files; the
    values are free in the paths the shared walker already returns.

    Typing follows Spark's partition-column inference, restricted to
    the subset that cannot mis-parse: a key is typed INT only when
    EVERY non-null value across the mapping is a pure integer literal
    (Spark's inference is likewise global - per-file typing could
    disagree with the column Spark actually materializes); everything
    else stays the unescaped STRING spelling. Date/timestamp-shaped
    strings then compare correctly in `survives`' canonical temporal
    space (the session is hardened to UTC, so Spark's timestamp
    partition semantics agree with the naive string compare), and a
    cross-type predicate (e.g. a float) hits the TypeError guard and
    keeps the file. A `__HIVE_DEFAULT_PARTITION__` value records
    nulls=rows (all-null: IS NOT NULL can prune the file, IS NULL
    keeps it); other values record nulls=0, so null tests prune
    exactly. Existing physical-column entries are never overwritten."""
    from urllib.parse import unquote as _unq

    want = set(columns)
    per_file: dict[str, dict[str, str]] = {}
    col_vals: dict[str, list[str]] = {}
    for rel in files:
        seen: dict[str, str] = {}
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                k, _, raw = seg.partition("=")
                if k in want and k not in seen:   # outermost wins
                    seen[k] = _unq(raw)
        per_file[rel] = seen
        for k, v in seen.items():
            col_vals.setdefault(k, []).append(v)
    int_cols = {k for k, vs in col_vals.items()
                if all(v == _NULL_PART or _INT_FORM.match(v)
                       for v in vs)
                and any(v != _NULL_PART for v in vs)}
    out: dict[str, dict] = {}
    for rel, st in files.items():
        st = dict(st or {})
        cols = dict(st.get("cols", {}))
        rows = st.get("rows")
        for k, v in per_file[rel].items():
            if k in cols:
                continue
            if v == _NULL_PART:
                if isinstance(rows, int):
                    cols[k] = {"nulls": rows}
                continue
            val: int | str = int(v) if k in int_cols else v
            cols[k] = {"min": val, "max": val, "nulls": 0}
        if cols:
            st["cols"] = cols
        out[rel] = st
    return out


def collect_stats(snapshot_dir: str, columns: list[str],
                  spark=None) -> dict[str, dict]:
    """{relative-path: file_stats(...)} for every data file under
    `snapshot_dir` (see :func:`walk_parquet`). Files whose footer
    stats are unavailable are recorded as {} - present in the manifest
    (membership authority), never pruned. Fan-out per
    :func:`stats_for_files` when `spark` is given. Partition-key
    columns named in `columns` get path-derived min=max entries
    (:func:`add_partition_stats`)."""
    return add_partition_stats(
        stats_for_files(walk_parquet(snapshot_dir), columns, spark),
        columns)


#: Spark column types whose min/max the scan-side stats pass records -
#: the exact counterpart of the footer path's _ORDERED/_canon gate.
_SCAN_TYPES = frozenset({
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "string", "date", "timestamp", "timestamp_ntz",
})

#: Types whose bounds are unusable (boolean: useless; decimal/binary:
#: canonical form doesn't sort like the value) but whose exact null
#: counts still feed IS [NOT] NULL pruning - recorded nulls-only, the
#: same shape the footer path produces for them. Complex types record
#: nothing on either path.
_SCAN_NULLS_ONLY = ("boolean", "binary")


def _scan_mode(dtype: str) -> str | None:
    if dtype in _SCAN_TYPES:
        return "bounds"
    if dtype in _SCAN_NULLS_ONLY or dtype.startswith("decimal("):
        return "nulls"
    return None


def stats_via_scan(spark, snapshot_dir: str,
                   columns: list[str]) -> dict[str, dict]:
    """TASK-SIDE per-file stats (VERDICT r12 #3): one column-pruned
    Spark aggregation job over the freshly-staged snapshot, grouped by
    `_metadata.file_path` - min/max/null-count per (file, column)
    computed on the executors, through Spark's own readers, so
    scheme-qualified roots (hdfs:// s3a:// file://) fan out exactly
    like local ones (the footer path's executors-have-no-Hadoop-client
    limitation does not apply: this IS a Spark job). The collect is
    file-count-sized (control plane).

    Output parity with :func:`collect_stats` (pytest-pinned field-for-
    field on every recorded type): same canonical forms via _canon,
    NaN-polluted float columns record no bounds (footer writers
    disagree on NaN, scan mirrors by dropping bounds when any NaN is
    present), all-null columns record nulls only, partition-key
    columns (directory-encoded, no physical chunk) get path-derived
    min=max entries via :func:`add_partition_stats` (r14, same as the
    footer path - VERDICT r13 #3),
    empty part files record {"rows": 0, cols: {c: {"nulls": 0}}}. The
    one DOCUMENTED divergence: parquet truncates long-string footer
    stats (64-byte prefix, max's last byte bumped) where the scan
    records the exact bounds - strictly tighter, conservative in the
    same direction, prune==filter unaffected.

    This is the per-partition-file aggregation shape of Delta's
    task-side stats collection; PySpark exposes no hook inside the
    write job's tasks themselves, so the pass runs as a second
    metadata+stats-columns-only job over the staged files rather than
    piggybacked on the write - the manifest format is identical either
    way."""
    # membership + partition-key discovery from the shared walker
    # (metadata-sized; the SAME file-visibility rule collect_stats
    # applies, so the two collectors agree on the file set)
    rels = [r for r, _ in walk_parquet(snapshot_dir)]
    part_keys = {seg.split("=", 1)[0]
                 for r in rels for seg in r.split("/")[:-1] if "=" in seg}

    from pyspark.sql import functions as F

    df = spark.read.parquet(snapshot_dir)
    types = dict(df.dtypes)
    modes = {c: _scan_mode(types[c]) for c in columns
             if c in types and c not in part_keys}
    cols = [c for c, m in modes.items() if m is not None]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        # backtick-quoted: a column literally named 'a.b' must resolve
        # as the column, not a struct path (the footer path matched
        # names exactly; the scan path must too)
        qc = F.col(f"`{c}`")
        aggs.append((F.count(F.lit(1)) - F.count(qc)).alias(f"__nu_{i}"))
        if modes[c] == "bounds":
            aggs += [F.min(qc).alias(f"__mn_{i}"),
                     F.max(qc).alias(f"__mx_{i}")]
            if types[c] in ("float", "double"):
                aggs.append(F.max(F.isnan(qc).cast("int"))
                            .alias(f"__nan_{i}"))
    grouped = (df.groupBy(F.col("_metadata.file_path").alias("__path"))
               .agg(*aggs).collect())

    # URI -> manifest-relative path: split on the LAST occurrence of
    # the snapshot dir's name segment (rsplit: a root path that itself
    # contains a segment spelled like the version dir - e.g.
    # /data/v00000001/t/v00000001/... - must not split at the first).
    # Partition segments below the snapshot are key=value shaped, so
    # they can never collide with the marker.
    marker = "/" + os.path.basename(snapshot_dir.rstrip("/")) + "/"

    # PySpark's collect() materializes TIMESTAMP (the LTZ type) via
    # datetime.fromtimestamp, i.e. NAIVE datetimes in the PYTHON
    # PROCESS's OS timezone (not spark.sql.session.timeZone - that
    # governs the Arrow/toPandas path); _canon's canonical space is
    # naive UTC (what parquet footers hand back), so re-anchor before
    # canonicalizing - otherwise a non-UTC host writes local bounds
    # that wrongly prune against UTC predicate values (r13 review).
    # astimezone() on a naive datetime attaches the OS zone; _canon's
    # tz-aware branch then converts to naive UTC. timestamp_ntz and
    # date need no conversion (timezone-free).
    def _canon_val(c: str, v):
        if (types[c] == "timestamp" and isinstance(v, datetime.datetime)
                and v.tzinfo is None):
            v = v.astimezone()
        return _canon(v)

    # _metadata.file_path is a URI: percent-decode before matching the
    # raw marker, or a snapshot path with a space/'#' in any parent
    # segment never matches and the commit crashes after staging.
    # Hive-escaped partition dir names round-trip correctly: their
    # on-disk '%XX' is double-encoded in the URI and one unquote
    # restores the on-disk (scandir-visible) spelling.
    from urllib.parse import unquote

    out: dict[str, dict] = {}
    for row in grouped:
        decoded = unquote(row["__path"])
        if marker not in decoded:
            # An unexpected URI normalization (symlinked/canonicalized
            # stage path) would otherwise surface as a bare IndexError
            # AFTER the snapshot is fully staged (ADVICE r13) - fail
            # with the actual paths so the commit is diagnosable.
            raise ValueError(
                f"scan-side stats saw file {decoded!r} whose URI does "
                f"not contain the snapshot marker {marker!r} - cannot "
                "map it to a manifest-relative path (use the footer "
                "collector for this root)")
        rel = decoded.rsplit(marker, 1)[1]
        entry_cols: dict[str, dict] = {}
        for i, c in enumerate(cols):
            nulls = int(row[f"__nu_{i}"])
            e: dict = {"nulls": nulls}
            if modes[c] == "bounds":
                mn = _canon_val(c, row[f"__mn_{i}"])
                mx = _canon_val(c, row[f"__mx_{i}"])
                nan = (types[c] in ("float", "double")
                       and (row[f"__nan_{i}"] or 0) > 0)
                if mn is not None and mx is not None and not nan:
                    e["min"] = mn
                    e["max"] = mx
            entry_cols[c] = e
        out[rel] = {"rows": int(row["__rows"]), "cols": entry_cols}
    # empty part files produce no scan group but are still manifest
    # members (membership authority: absent = invisible to pruned
    # reads) - record them the way an empty footer does
    for rel in rels:
        if rel not in out:
            out[rel] = {"rows": 0,
                        "cols": {c: {"nulls": 0} for c in cols}}
    # partition-key columns (directory-encoded, excluded from the scan
    # aggregation above) get their path-derived min=max entries - the
    # SAME augmentation collect_stats applies, keeping the two
    # collectors field-identical (VERDICT r13 #3)
    return add_partition_stats(out, columns)


#: Predicate ops understood by :func:`survives`. "between" takes a
#: (lo, hi) inclusive pair as its value; "in" an iterable of members
#: (a disjunction of "=": the file survives when ANY member might
#: match); "is_null" / "is_not_null" ignore the value and prune on the
#: recorded exact null count.
OPS = ("=", "<", "<=", ">", ">=", "between", "in",
       "is_null", "is_not_null")


def clause_survives(stats: dict | None, clause) -> bool:
    """CNF clause verdict (r13): an ATOM (col, op[, value]) keeps the
    file per :func:`survives`; a LIST of atoms is their DISJUNCTION -
    the file is kept when ANY member might match (still conservative:
    a clause is dropped only when every disjunct provably excludes
    every row). An EMPTY clause is rejected loudly (ADVICE r13):
    read_version/read_layout_manifest normalize via _norm_prune, but
    pruned_files() passes raw caller predicates straight here - a
    silent all-files-pruned verdict (or a bare TypeError on an empty
    tuple) would hide the caller's malformed predicate."""
    if len(clause) == 0:
        raise ValueError("empty prune clause: a disjunction of nothing "
                         "matches nothing - filter explicitly instead")
    if isinstance(clause, tuple) or isinstance(clause[0], str):
        atom = tuple(clause)
        if len(atom) == 2:
            atom = (*atom, None)
        return survives(stats, *atom)
    return any(clause_survives(stats, a) for a in clause)


def survives(stats: dict | None, col: str, op: str, value) -> bool:
    """May this file contain a row matching `col op value`? False ONLY
    when the recorded stats provably exclude every match; every doubt
    (no stats, no min/max, uncomparable types, inexact null counts)
    keeps the file."""
    if op not in OPS:
        raise ValueError(f"unknown predicate op {op!r} (know {OPS})")
    entry = (stats or {}).get("cols", {}).get(col)
    if op == "is_null":
        # A file whose column records zero nulls provably has none; a
        # column MISSING from the file reads back all-NULL, but then
        # records no entry here (footer has no such chunk) -> kept.
        if entry is None or "nulls" not in entry:
            return True
        return entry["nulls"] > 0
    if op == "is_not_null":
        rows = (stats or {}).get("rows")
        if (entry is None or "nulls" not in entry
                or not isinstance(rows, int)):
            return True
        return entry["nulls"] < rows
    if op == "in":
        members = list(value)
        # IN () matches no row (Spark's Column.isin() with no values
        # is a constant false) - pruning every file equals the filter.
        return any(survives(stats, col, "=", m) for m in members)
    if not entry or "min" not in entry:
        return True
    mn, mx = entry["min"], entry["max"]
    # A NaN predicate value matches rows parquet stats cannot see
    # (Spark AND DuckDB define NaN = NaN as TRUE, and writers exclude
    # NaN from min/max) - every file may hold one; never prune.
    import math

    def _isnan(x):
        return isinstance(x, float) and math.isnan(x)

    if op == "between":
        if _isnan(value[0]) or _isnan(value[1]):
            return True
    elif _isnan(value):
        return True
    # Temporal alignment triggers on the CANONICAL FORM, not the
    # Python type (r13 review): date/datetime objects canonicalize to
    # form-matching strings, and a STRING-typed predicate spelled like
    # a date ('2024-02-01' - Spark casts it to midnight in the filter)
    # has the identical midnight-granularity hazard against timestamp
    # stats the ADVICE-r12 fix closed for datetime objects. Aligning
    # is order-preserving within the form-matching subset, so string
    # columns whose values are date-shaped keep their pruning power;
    # a date-shaped predicate against NON-temporal bounds returns
    # don't-know -> keep.
    def _temporalish(s) -> bool:
        return isinstance(s, str) and bool(_TEMPORAL_FORM.match(s))

    try:
        if op == "between":
            lo, hi = (canon_pred_value(value[0]),
                      canon_pred_value(value[1]))
            if lo is None or hi is None:
                return True
            t0, t1 = _temporalish(lo), _temporalish(hi)
            if t0 != t1:
                return True          # mixed-granularity pair: keep
            if t0:
                a = _temporal_align(lo, mn, mx)
                if a is None:
                    return True
                lo, mn, mx = a[:3]       # between is non-strict already
                hi = _midnight(hi)
            return mx >= lo and mn <= hi
        v = canon_pred_value(value)
        if v is None:
            return True
        v_ext = mn_ext = False
        if _temporalish(v):
            a = _temporal_align(v, mn, mx)
            if a is None:
                return True
            v, mn, mx, v_ext, mn_ext = a
        if op == "=":
            return mn <= v <= mx
        # Strict ops relax to non-strict exactly when THEIR hazardous
        # operand was midnight-extended (ADVICE r13, per-operand
        # analysis in _temporal_align's docstring) - string columns
        # holding date-shaped values keep the prune==filter contract
        # at granularity boundaries, timestamp/date columns keep full
        # strict pruning power everywhere the verdict is provable.
        if op == "<":
            return mn <= v if mn_ext else mn < v
        if op == "<=":
            return mn <= v
        if op == ">":
            return mx >= v if v_ext else mx > v
        return mx >= v                   # ">="
    except TypeError:
        return True                      # cross-type compare: keep
