"""Manifest add-action stats + file-level data skipping (VERDICT r11
#3, sources/filestats.py): the engine's mapping of the reference's
b-tree indexes (SURVEY SS4.1 - reference models/bronze/02:90-94 keeps
25+ indexes so point-lookups never scan the table; here a selective
read drops files from the KB-sized manifest instead).

Two invariants, each pinned per surface:
  * EQUALITY: pruned read == unpruned read + filter, always (pruning is
    a plan optimization, never a semantics change);
  * SKIPPING: on a range-clustered table a selective predicate's
    surviving file list is a strict subset (the file-count guard - the
    part a pure result check can't see).
Conservatism (no-stats / all-null / cross-type) is pinned directly on
filestats.survives.
"""

from __future__ import annotations

import datetime
import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.sources import filestats, fsio
from etl_pipeline_mini_project_01_spark.sources.versioned import (
    pruned_files,
    read_version,
    write_version,
    write_version_cas,
)


@pytest.fixture(params=["plain", "file_uri"])
def root(request):
    d = tempfile.mkdtemp(prefix="dskip_")
    yield (d + "/t") if request.param == "plain" else f"file://{d}/t"
    shutil.rmtree(d, ignore_errors=True)


def _clustered_df(spark, n=4000, files=8):
    """id-range-clustered frame: repartitionByRange gives each file a
    disjoint id interval, so id predicates are maximally skippable."""
    return (spark.range(n)
            .select(F.col("id"),
                    (F.col("id") * 2).cast("double").alias("val"),
                    F.concat(F.lit("u"), F.format_string("%06d", "id"))
                    .alias("name"))
            .repartitionByRange(files, "id"))


def _manifest(root, v):
    import os
    return fsio.read_json(
        os.path.join(root, "_versions", f"v{v:08d}.json"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_versioned_prune_equals_filter_and_skips_files(spark, root):
    df = _clustered_df(spark)
    v = write_version(df, root, stats_columns=["id", "name"])
    man = _manifest(root, v)
    assert man["stats"]["columns"] == ["id", "name"]
    n_files = len(man["stats"]["files"])
    assert n_files >= 4

    cases = [
        ("id", "=", 1234),
        ("id", "<", 500),
        ("id", ">=", 3900),
        ("id", "between", (1000, 1499)),
        ("name", "=", "u000042"),
        ("name", ">", "u003995"),
    ]
    for col, op, val in cases:
        kept, total = pruned_files(man, [(col, op, val)])
        assert total == n_files
        assert 0 < len(kept) < total, (col, op, val, kept)
        got = _rows(read_version(spark, root, prune=(col, op, val)))
        from etl_pipeline_mini_project_01_spark.sources.versioned import (
            _pred_column,
        )
        want = _rows(read_version(spark, root).filter(
            _pred_column(col, op, val)))
        assert got == want and len(want) > 0, (col, op, val)

    # full-range predicate: nothing skipped, same rows
    kept, total = pruned_files(man, [("id", ">=", 0)])
    assert len(kept) == total
    assert _rows(read_version(spark, root, prune=("id", ">=", 0))) \
        == _rows(read_version(spark, root))

    # provably-empty predicate: zero files scanned, empty frame, schema
    kept, _ = pruned_files(man, [("id", ">", 10 ** 9)])
    assert kept == []
    empty = read_version(spark, root, prune=("id", ">", 10 ** 9))
    assert empty.count() == 0
    assert empty.columns == read_version(spark, root).columns

    # predicate conjunction narrows the survivor set monotonically
    kept_one, _ = pruned_files(man, [("id", ">=", 1000)])
    kept_two, _ = pruned_files(man, [("id", ">=", 1000),
                                     ("id", "<", 1500)])
    assert set(kept_two) <= set(kept_one)


def test_versioned_prune_without_stats_is_filter_only(spark, root):
    """A stats-less manifest (the pre-r12 shape and the default) must
    serve prune= correctly - full scan + filter, nothing dropped."""
    df = _clustered_df(spark, n=500, files=4)
    v = write_version(df, root)                 # no stats_columns
    assert "stats" not in _manifest(root, v)
    assert pruned_files(_manifest(root, v), [("id", "=", 7)]) is None
    got = _rows(read_version(spark, root, prune=("id", "<", 100)))
    assert got == _rows(read_version(spark, root)
                        .filter(F.col("id") < 100))


def test_versioned_prune_on_column_without_stats_keeps_all(spark, root):
    """Predicates on a column OUTSIDE the declared stats set prune
    nothing (conservative) but still filter correctly."""
    df = _clustered_df(spark, n=800, files=4)
    v = write_version(df, root, stats_columns=["id"])
    man = _manifest(root, v)
    kept, total = pruned_files(man, [("val", "<", 100.0)])
    assert len(kept) == total                   # no stats for val
    got = _rows(read_version(spark, root, prune=("val", "<", 100.0)))
    assert got == _rows(read_version(spark, root)
                        .filter(F.col("val") < 100.0))


def test_versioned_prune_partitioned_snapshot(spark, root):
    """Partitioned snapshots keep their key=value path segments in the
    stats file map; pruning composes with the partition layout."""
    df = (spark.range(1000)
          .select("id", (F.col("id") % 4).alias("p"),
                  (F.col("id") * 3).alias("x"))
          .repartitionByRange(8, "id"))
    write_version(df, root, partition_by=["p"], stats_columns=["id"])
    man = _manifest(root, 1)
    assert all("p=" in rel for rel in man["stats"]["files"])
    kept, total = pruned_files(man, [("id", "<", 100)])
    assert 0 < len(kept) < total
    got = _rows(read_version(spark, root, prune=("id", "<", 100)))
    want = _rows(read_version(spark, root).filter(F.col("id") < 100))
    assert got == want and len(want) == 100


def test_cas_commit_records_stats_too(spark, root):
    df = _clustered_df(spark, n=600, files=4)
    write_version(df, root, stats_columns=["id"])
    v = write_version_cas(_clustered_df(spark, n=600, files=4), root,
                          expected_version=1, stats_columns=["id"])
    man = _manifest(root, v)
    kept, total = pruned_files(man, [("id", "=", 5)])
    assert 0 < len(kept) < total


def test_timestamp_stats_prune(spark, root):
    """Timestamps canonicalize to naive-UTC ISO strings - lexicographic
    order == chronological, so time-range prunes work."""
    base = datetime.datetime(2024, 1, 1)
    df = (spark.range(96)
          .select("id",
                  (F.lit(base) + F.make_interval(hours=F.col("id")))
                  .alias("ts"))
          .repartitionByRange(6, "id"))
    write_version(df, root, stats_columns=["ts"])
    man = _manifest(root, 1)
    cut = datetime.datetime(2024, 1, 1, 12)
    kept, total = pruned_files(man, [("ts", "<", cut)])
    assert 0 < len(kept) < total
    got = _rows(read_version(spark, root, prune=("ts", "<", cut)))
    assert got == _rows(read_version(spark, root)
                        .filter(F.col("ts") < F.lit(cut)))
    assert len(got) == 12


def test_survives_conservatism_matrix():
    """The file may be kept spuriously, never dropped wrongly."""
    st = {"rows": 10, "cols": {"a": {"min": 10, "max": 20, "nulls": 2}}}
    s = filestats.survives
    # in-range / out-of-range basics
    assert s(st, "a", "=", 15) and not s(st, "a", "=", 25)
    assert s(st, "a", "<", 11) and not s(st, "a", "<", 10)
    assert s(st, "a", "<=", 10) and not s(st, "a", "<=", 9)
    assert s(st, "a", ">", 19) and not s(st, "a", ">", 20)
    assert s(st, "a", ">=", 20) and not s(st, "a", ">=", 21)
    assert s(st, "a", "between", (18, 30))
    assert not s(st, "a", "between", (21, 30))
    # no stats at all / unknown column / nulls-only entry -> keep
    assert s(None, "a", "=", 999)
    assert s({}, "a", "=", 999)
    assert s(st, "zzz", "=", 999)
    assert s({"cols": {"a": {"nulls": 10}}}, "a", "=", 0)
    # cross-type predicate -> keep (TypeError path)
    assert s(st, "a", "=", "a-string")
    # uncanonicalizable predicate value -> keep
    assert s(st, "a", "=", object())
    # unknown op -> loud
    with pytest.raises(ValueError, match="unknown predicate op"):
        s(st, "a", "~", 1)


def test_all_null_column_records_nulls_only(spark, root):
    df = (spark.range(100)
          .select("id", F.lit(None).cast("bigint").alias("n"))
          .repartitionByRange(4, "id"))
    write_version(df, root, stats_columns=["id", "n"])
    man = _manifest(root, 1)
    for st in man["stats"]["files"].values():
        entry = st["cols"].get("n")
        assert entry is not None and "min" not in entry
        assert entry["nulls"] > 0
    # a predicate on the all-null column prunes nothing, filters fine
    kept, total = pruned_files(man, [("n", "=", 5)])
    assert len(kept) == total
    assert read_version(spark, root, prune=("n", "=", 5)).count() == 0


def test_distributed_stats_equal_sequential(spark, root):
    """stats_for_files' executor fan-out (the 100 TB commit path: a
    k-list layout commit is k x files_per_cluster footer reads, a
    driver loop at k ~ 1e5 would be the commit's critical path) must
    produce byte-identical stats to the sequential driver loop."""
    import os

    df = _clustered_df(spark, n=1200, files=6)
    write_version(df, root, stats_columns=["id", "name"])
    man = _manifest(root, 1)
    snap = os.path.join(root, man["dir"]).replace("file://", "")
    pairs = [(rel, os.path.join(snap, rel))
             for rel in man["stats"]["files"]]
    seq = filestats.stats_for_files(pairs, ["id", "name"], spark=None)
    dist = filestats.stats_for_files(pairs, ["id", "name"], spark=spark,
                                     distribute_threshold=0)
    assert seq == dist == man["stats"]["files"]


def test_nan_never_prunes(spark, root):
    """r12 review-sweep finding: Spark AND DuckDB define NaN = NaN as
    TRUE while parquet writers exclude NaN from footer min/max, so a
    range check against stats would wrongly drop the NaN-holding file
    for a NaN predicate. Both guards pinned: a NaN predicate VALUE
    keeps every file, and NaN-polluted stats record no bounds."""
    df = (spark.range(400)
          .select("id",
                  F.when(F.col("id") == 399, float("nan"))
                  .otherwise(F.col("id").cast("double")).alias("x"))
          .repartitionByRange(4, "id"))
    write_version(df, root, stats_columns=["x"])
    man = _manifest(root, 1)
    kept, total = pruned_files(man, [("x", "=", float("nan"))])
    assert len(kept) == total            # NaN predicate: keep all
    got = read_version(spark, root,
                       prune=("x", "=", float("nan"))).collect()
    assert [r.id for r in got] == [399]  # the NaN row IS found
    # survives() unit form, both positions of between too
    st = {"cols": {"x": {"min": 1.0, "max": 2.0, "nulls": 0}}}
    assert filestats.survives(st, "x", "=", float("nan"))
    assert filestats.survives(st, "x", "between", (float("nan"), 5.0))
    assert filestats.survives(st, "x", "between", (0.0, float("nan")))


def test_long_string_stats_never_drop_wrongly(spark, root):
    """Parquet truncates long-string footer stats (parquet-mr: 64-byte
    prefix, max's last byte incremented to stay an upper bound). The
    pruned read must stay exactly equal to filter on values whose
    distinguishing suffix lies PAST the truncation point."""
    prefix = "p" * 80
    df = (spark.range(300)
          .select("id", F.concat(F.lit(prefix),
                                 F.format_string("%06d", "id"))
                  .alias("s"))
          .repartitionByRange(4, "id"))
    write_version(df, root, stats_columns=["s"])
    target = prefix + "000123"
    got = read_version(spark, root, prune=("s", "=", target)).collect()
    assert [r.id for r in got] == [123]
    hi = read_version(spark, root, prune=("s", ">=", prefix + "000290"))
    assert hi.count() == 10


def test_prune_equals_filter_property(spark, tmp_path):
    """Property: for RANDOM data layouts and predicates, the pruned
    read equals the unpruned read + filter - the invariant everything
    else rests on. Data is written once (hypothesis drives predicates
    only, so the battery stays fast); values include negatives,
    duplicates across files, and a null tail."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    root = str(tmp_path / "t")
    df = (spark.range(600)
          .select("id",
                  F.when(F.col("id") % 17 == 0, None)
                  .otherwise((F.col("id") % 97) - 48).alias("k"))
          .repartitionByRange(6, "k"))
    write_version(df, root, stats_columns=["k"])
    man = _manifest(root, 1)
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        _pred_column,
    )

    @settings(max_examples=25, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(op=st.sampled_from(["=", "<", "<=", ">", ">=", "between"]),
           a=st.integers(-60, 60), b=st.integers(-60, 60))
    def run(op, a, b):
        val = (min(a, b), max(a, b)) if op == "between" else a
        kept, total = pruned_files(man, [("k", op, val)])
        got = _rows(read_version(spark, root, prune=("k", op, val)))
        want = _rows(read_version(spark, root)
                     .filter(_pred_column("k", op, val)))
        assert got == want, (op, val, kept, total)

    run()


def test_date_datetime_granularity_alignment():
    """ADVICE r12: dates ('2024-02-01') and datetimes ('2024-02-01
    00:00:00') canonicalize into different string granularities, and a
    date predicate against timestamp-column stats wrongly pruned files
    whose matches sit exactly at midnight. Both directions align now."""
    s = filestats.survives
    d = datetime.date(2024, 2, 1)
    ts_stats = {"rows": 5, "cols": {"ts": {
        "min": "2024-02-01 00:00:00", "max": "2024-02-03 12:00:00",
        "nulls": 0}}}
    # the exact ADVICE repro: '=', '<=', and between's upper bound
    assert s(ts_stats, "ts", "=", d)
    assert s(ts_stats, "ts", "<=", d)
    assert s(ts_stats, "ts", "between", (datetime.date(2024, 1, 30), d))
    # still prunes when provably out of range
    assert not s(ts_stats, "ts", "=", datetime.date(2024, 1, 31))
    assert not s(ts_stats, "ts", "<", d)
    assert not s(ts_stats, "ts", ">", datetime.date(2024, 2, 4))
    assert s(ts_stats, "ts", ">", datetime.date(2024, 2, 3))
    # datetime predicate against DATE-granularity stats (old manifests)
    date_stats = {"rows": 5, "cols": {"d": {
        "min": "2024-02-01", "max": "2024-02-03", "nulls": 0}}}
    assert s(date_stats, "d", "=", datetime.datetime(2024, 2, 3))
    assert s(date_stats, "d", "<=", datetime.datetime(2024, 2, 1))
    # ADVICE r13: '<' with a bare-date MIN and a midnight predicate
    # must KEEP - the stats cannot distinguish a DATE column (where
    # pruning would be exact) from a STRING column holding
    # '2024-02-01', whose bare-date row sorts strictly below the
    # midnight spelling and WOULD match the string filter.
    assert s(date_stats, "d", "<", datetime.datetime(2024, 2, 1))
    # ...but away from the collapsed boundary strictness is kept
    assert not s(date_stats, "d", "<", datetime.datetime(2024, 1, 31))
    assert not s(date_stats, "d", "=",
                 datetime.datetime(2024, 2, 3, 0, 0, 1))
    # a temporal predicate against NON-temporal stats: don't-know, keep
    str_stats = {"rows": 5, "cols": {"s": {
        "min": "apple", "max": "pear", "nulls": 0}}}
    assert s(str_stats, "s", "=", d)
    assert s(str_stats, "s", "between", (d, d))
    # date/datetime between pair: both are temporal, so alignment
    # applies - provably-out-of-range pairs still prune, upper bounds
    # touching min at midnight keep
    assert not s(ts_stats, "ts", "between",
                 (datetime.date(2024, 1, 1),
                  datetime.datetime(2024, 1, 5)))
    assert s(ts_stats, "ts", "between",
             (datetime.date(2024, 1, 1), datetime.datetime(2024, 2, 1)))
    # a temporal/non-temporal between pair: don't-know, keep
    assert s(ts_stats, "ts", "between", (datetime.date(2024, 1, 1), 5))


def test_date_predicate_on_timestamp_column_end_to_end(spark, root):
    """The pruned read finds the midnight row a date predicate matches
    on a timestamp column - pruned == filter, and the '=' lookup still
    skips files."""
    base = datetime.datetime(2024, 1, 1)
    df = (spark.range(96)
          .select("id",
                  (F.lit(base) + F.make_interval(hours=F.col("id")))
                  .alias("ts"))
          .repartitionByRange(6, "id"))
    write_version(df, root, stats_columns=["ts"])
    man = _manifest(root, 1)
    day2 = datetime.date(2024, 1, 2)     # matches exactly hour 24
    for op, val, n_want in [("=", day2, 1), ("<=", day2, 25),
                            ("between", (day2, day2), 1),
                            ("<", day2, 24), (">=", day2, 72)]:
        got = _rows(read_version(spark, root, prune=("ts", op, val)))
        from etl_pipeline_mini_project_01_spark.sources.versioned import (
            _pred_column,
        )
        want = _rows(read_version(spark, root)
                     .filter(_pred_column("ts", op, val)))
        assert got == want and len(got) == n_want, (op, val)
    kept, total = pruned_files(man, [("ts", "=", day2)])
    assert 0 < len(kept) < total


def test_in_list_prune(spark, root):
    """IN-list point lookups: only files whose range may hold a member
    survive; the read equals filter(isin(...))."""
    df = _clustered_df(spark, n=4000, files=8)
    write_version(df, root, stats_columns=["id"])
    man = _manifest(root, 1)
    members = [5, 3995]
    kept, total = pruned_files(man, [("id", "in", members)])
    assert len(kept) == 2 and total == 8
    got = _rows(read_version(spark, root, prune=("id", "in", members)))
    assert got == _rows(read_version(spark, root)
                        .filter(F.col("id").isin(members)))
    assert len(got) == 2
    # empty IN matches no row: every file pruned, read is empty -
    # exactly what filter(isin()) returns
    kept0, _ = pruned_files(man, [("id", "in", [])])
    assert kept0 == []
    assert read_version(spark, root, prune=("id", "in", [])).count() == 0
    # a NaN member keeps every file (NaN = NaN is TRUE in Spark/DuckDB)
    keptn, _ = pruned_files(man, [("id", "in", [float("nan")])])
    assert len(keptn) == total


def test_null_count_pruning(spark, root):
    """IS [NOT] NULL prunes on the manifest's exact per-file null
    counts: all-null files drop for IS NOT NULL, null-free files drop
    for IS NULL, and the reads equal their filters."""
    df = (spark.range(1000)
          .select("id",
                  F.when(F.col("id") < 500, None)
                  .otherwise(F.col("id")).alias("k"))
          .repartitionByRange(4, "id"))
    write_version(df, root, stats_columns=["k"])
    man = _manifest(root, 1)
    kept_null, total = pruned_files(man, [("k", "is_null", None)])
    kept_notnull, _ = pruned_files(man, [("k", "is_not_null", None)])
    assert 0 < len(kept_null) < total
    assert 0 < len(kept_notnull) < total
    # value-less 2-tuple spelling works end-to-end
    got_null = _rows(read_version(spark, root, prune=("k", "is_null")))
    assert got_null == _rows(read_version(spark, root)
                             .filter(F.col("k").isNull()))
    assert len(got_null) == 500
    got_nn = _rows(read_version(spark, root, prune=("k", "is_not_null")))
    assert got_nn == _rows(read_version(spark, root)
                           .filter(F.col("k").isNotNull()))
    assert len(got_nn) == 500


def test_null_ops_conservatism():
    """Null-count pruning only trusts EXACT counts: a missing 'nulls'
    key (some row group reported no null_count) or missing 'rows'
    keeps the file."""
    s = filestats.survives
    exact = {"rows": 10, "cols": {"a": {"min": 1, "max": 9, "nulls": 0}}}
    assert not s(exact, "a", "is_null", None)
    assert s(exact, "a", "is_not_null", None)
    all_null = {"rows": 10, "cols": {"a": {"nulls": 10}}}
    assert s(all_null, "a", "is_null", None)
    assert not s(all_null, "a", "is_not_null", None)
    no_nulls_key = {"rows": 10, "cols": {"a": {"min": 1, "max": 9}}}
    assert s(no_nulls_key, "a", "is_null", None)
    assert s(no_nulls_key, "a", "is_not_null", None)
    no_rows = {"cols": {"a": {"nulls": 0}}}
    assert s(no_rows, "a", "is_not_null", None)
    assert not s(no_rows, "a", "is_null", None)   # exact 0 still prunes
    # unknown column / no stats at all -> keep both ways
    assert s(None, "a", "is_null", None)
    assert s({}, "a", "is_not_null", None)
    # IN against missing stats -> keep; IN with one in-range member
    st = {"rows": 10, "cols": {"a": {"min": 10, "max": 20, "nulls": 0}}}
    assert s(st, "a", "in", [1, 15])
    assert not s(st, "a", "in", [1, 25])
    assert s(None, "a", "in", [1])


# ---------------------------------------------------------------- layout


def _fit_tiny_layout(spark, path, stats_columns):
    """Layout whose clusters = id bands of 100 (embedding is a function
    of id//100): the id-locality an appended-daily corpus has naturally,
    and the shape where id stats actually skip - a cluster whose rows
    span the whole id range records a useless full-range min/max."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        write_ivf_layout,
    )

    band = F.floor(F.col("id") / 100).cast("float")
    emb = (spark.range(400)
           .select(F.col("id").alias("vec_id"),
                   F.array(band, band).alias("embedding")))
    cents = [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]
    write_ivf_layout(emb, cents, dim=2, path=path,
                     files_per_cluster=2, stats_columns=stats_columns)
    return emb


def test_layout_manifest_stats_point_lookup(spark, tmp_path):
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        manifest_entries,
        read_layout_manifest,
    )

    path = str(tmp_path / "lay")
    _fit_tiny_layout(spark, path, stats_columns=["vec_id"])
    entries = manifest_entries(path)
    assert entries and all(s is not None for _, _, s in entries)
    total = len(entries)
    # the survivor count for one id must be << the manifest
    surv = [1 for _, _, s in entries
            if filestats.survives(json.loads(s), "vec_id", "=", 123)]
    assert 0 < len(surv) < total
    got = _rows(read_layout_manifest(
        spark, path, file_pred=("vec_id", "=", 123)).select("vec_id"))
    assert got == [(123,)]
    # equality against the unpruned read + filter, on a range too
    pred = ("vec_id", "between", (100, 140))
    got = _rows(read_layout_manifest(spark, path, file_pred=pred)
                .select("vec_id"))
    want = _rows(read_layout_manifest(spark, path)
                 .filter(F.col("vec_id").between(100, 140))
                 .select("vec_id"))
    assert got == want and len(want) == 41
    # provably-empty -> empty frame, schema intact
    out = read_layout_manifest(spark, path,
                               file_pred=("vec_id", "=", 10 ** 9))
    assert out.count() == 0 and "embedding" in out.columns


def test_layout_stats_survive_incremental_append(spark, tmp_path):
    """The add-action commit carries prior stats verbatim and stats the
    delta's new files; a stats-less append leaves new files unpruned
    but never disturbs carried stats."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        manifest_entries,
        read_layout_manifest,
    )

    path = str(tmp_path / "lay")
    _fit_tiny_layout(spark, path, stats_columns=["vec_id"])
    delta = (spark.range(400, 500)
             .select(F.col("id").alias("vec_id"),
                     F.array(F.col("id").cast("float") % 7,
                             (F.col("id") % 11).cast("float"))
                     .alias("embedding")))
    cents = [[0.0, 0.0], [3.0, 3.0], [6.0, 9.0]]
    append_to_ivf_layout(delta, cents, dim=2, path=path,
                         stats_columns=["vec_id"])
    entries = manifest_entries(path)
    assert all(s is not None for _, _, s in entries)
    got = _rows(read_layout_manifest(
        spark, path, file_pred=("vec_id", "=", 450)).select("vec_id"))
    assert got == [(450,)]
    # old rows still found after the append
    got = _rows(read_layout_manifest(
        spark, path, file_pred=("vec_id", "=", 7)).select("vec_id"))
    assert got == [(7,)]


def test_layout_stats_survive_compaction_and_mixed_conventions(
        spark, tmp_path):
    """compact_layout_generation(stats_columns=...) re-stats the
    compacted gen= files; a subsequent stats-less bare append leaves
    its new files conservatively unpruned while carried gen= stats
    keep pruning - file_pred stays exactly-equal-to-filter across the
    mixed-convention manifest."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        append_to_ivf_layout,
        compact_layout_generation,
        manifest_entries,
        read_layout_manifest,
    )

    path = str(tmp_path / "lay")
    _fit_tiny_layout(spark, path, stats_columns=["vec_id"])
    compact_layout_generation(spark, path, files_per_cluster=2,
                              stats_columns=["vec_id"])
    entries = manifest_entries(path)
    assert entries and all(s is not None for _, _, s in entries)
    assert all(f.startswith("gen=") for _, f, _ in entries)
    # stats-less bare append on top of the compacted generation
    band = F.floor(F.col("id") / 100).cast("float")
    delta = (spark.range(400, 450)
             .select(F.col("id").alias("vec_id"),
                     F.array(band, band).alias("embedding")))
    cents = [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]
    append_to_ivf_layout(delta, cents, dim=2, path=path)
    entries = manifest_entries(path)
    gen_rows = [(c, f, s) for c, f, s in entries if f.startswith("gen=")]
    bare_rows = [(c, f, s) for c, f, s in entries
                 if f.startswith("cluster=")]
    assert gen_rows and all(s is not None for _, _, s in gen_rows)
    assert bare_rows and all(s is None for _, _, s in bare_rows)
    for probe, want in ((123, [(123,)]), (425, [(425,)])):
        got = _rows(read_layout_manifest(
            spark, path, file_pred=("vec_id", "=", probe))
            .select("vec_id"))
        assert got == want, probe


def test_layout_pre_stats_manifest_never_pruned(spark, tmp_path):
    """A manifest committed WITHOUT stats serves file_pred as a pure
    filter - every file survives (the pre-r12 compatibility shape)."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        manifest_entries,
        read_layout_manifest,
    )

    path = str(tmp_path / "lay")
    _fit_tiny_layout(spark, path, stats_columns=None)
    entries = manifest_entries(path)
    assert entries and all(s is None for _, _, s in entries)
    got = _rows(read_layout_manifest(
        spark, path, file_pred=("vec_id", "=", 123)).select("vec_id"))
    assert got == [(123,)]


def test_scan_stats_byte_identical_to_footer_path(spark, root):
    """VERDICT r12 #3: the task-side scan collector (the r13 default
    for versioned commits) must produce FIELD-IDENTICAL stats to the
    footer path across the whole recorded type matrix - ints, doubles
    (with a NaN-polluted file and an all-null file), short strings,
    dates, timestamps, null mixes - on plain and file:// roots, and on
    a partitioned snapshot (partition keys record identical
    path-derived min=max entries on both paths since r14)."""
    import math
    import os

    df = (spark.range(400)
          .select("id",
                  F.when(F.col("id") % 7 == 0, None)
                  .otherwise(F.col("id") * 2).alias("k"),
                  F.when(F.col("id") == 399, float("nan"))
                  .when(F.col("id") % 11 == 0, None)
                  .otherwise(F.col("id").cast("double") / 3).alias("x"),
                  F.lit(None).cast("double").alias("dead"),
                  F.format_string("u%06d", "id").alias("name"),
                  F.date_add(F.lit("2024-01-01").cast("date"),
                             (F.col("id") % 200).cast("int")).alias("d"),
                  (F.lit("2024-03-01 00:00:00").cast("timestamp")
                   + F.make_interval(secs=F.col("id"))).alias("ts"))
          .repartitionByRange(5, "id"))
    write_version(df, root)
    snap = os.path.join(root, "v00000001")
    cols = ["id", "k", "x", "dead", "name", "d", "ts", "ghost"]
    scan = filestats.stats_via_scan(spark, snap, cols)
    footer = filestats.collect_stats(snap, cols)
    assert set(scan) == set(footer) and len(scan) == 5
    for rel in footer:
        assert scan[rel] == footer[rel], (rel, scan[rel], footer[rel])
    # the NaN file recorded no x bounds on BOTH paths
    nan_entries = [st["cols"]["x"] for st in scan.values()
                   if "min" not in st["cols"]["x"]]
    assert len(nan_entries) == 1 and nan_entries[0]["nulls"] >= 0
    # all-null column: nulls-only entries everywhere
    assert all("min" not in st["cols"]["dead"]
               and st["cols"]["dead"]["nulls"] > 0
               for st in scan.values())

    # partitioned snapshot: partition keys record path-derived min=max
    # entries (r14, VERDICT r13 #3) identically on both collectors,
    # data columns stay identical
    pdf = df.withColumn("bucket", (F.col("id") % 3).cast("int"))
    write_version(pdf, root, partition_by=["bucket"])
    psnap = os.path.join(root, "v00000002")
    pcols = ["bucket", "k", "name"]
    pscan = filestats.stats_via_scan(spark, psnap, pcols)
    pfooter = filestats.collect_stats(psnap, pcols)
    assert pscan == pfooter and len(pscan) >= 3
    for rel, st in pscan.items():
        b = int(rel.split("=", 1)[1].split("/", 1)[0])
        assert st["cols"]["bucket"] == {"min": b, "max": b, "nulls": 0}
    assert all(rel.startswith("bucket=") for rel in pscan)


def test_scan_stats_exact_on_long_strings(spark, root):
    """The one documented scan/footer divergence: parquet truncates
    long-string footer stats (64-byte prefix, max's last byte bumped)
    where the scan records EXACT bounds - strictly tighter, same
    conservative direction, and the pruned read still equals the
    filter."""
    import os

    prefix = "p" * 80
    df = (spark.range(300)
          .select("id", F.concat(F.lit(prefix),
                                 F.format_string("%06d", "id"))
                  .alias("s"))
          .repartitionByRange(4, "id"))
    write_version(df, root, stats_columns=["s"])   # scan path default
    man = _manifest(root, 1)
    ent = next(iter(man["stats"]["files"].values()))["cols"]["s"]
    assert ent["min"].startswith(prefix) and len(ent["min"]) == 86
    assert ent["max"].startswith(prefix) and len(ent["max"]) == 86
    target = prefix + "000123"
    got = read_version(spark, root, prune=("s", "=", target)).collect()
    assert [r.id for r in got] == [123]
    # exact bounds prune the equality lookup to ONE file
    kept, total = pruned_files(man, [("s", "=", target)])
    assert len(kept) == 1 and total == 4


def test_default_write_path_does_no_footer_reads(spark, root, monkeypatch):
    """The r13 contract sentence itself: a stats-bearing versioned
    commit from a live session must never open a parquet footer
    driver-side - collection goes through the scan job."""
    def boom(*a, **k):
        raise AssertionError("footer path used on the default write")

    monkeypatch.setattr(filestats, "file_stats", boom)
    df = _clustered_df(spark, n=500, files=4)
    write_version(df, root, stats_columns=["id", "val"])
    man = _manifest(root, 1)
    assert len(man["stats"]["files"]) == 4
    kept, total = pruned_files(man, [("id", "<", 100)])
    assert 0 < len(kept) < total


def test_range_split_layout_prunes_id_point_lookups(spark, tmp_path):
    """r13 (VERDICT r12 #8, the z-order x IVF composition): with the
    default hash split, every file of a cluster spans the cluster's
    whole id range, so the r12 per-(cluster,file) stats cannot prune an
    id point-lookup - the delete/GDPR access path opens every file.
    split='range' gives each file a contiguous id slice; the SAME
    file_pred machinery then opens ~one file per cluster. Embedding
    and id are deliberately DECORRELATED (cluster = id % 4) so the
    contrast is the split's doing, not the data's."""
    import json as _json

    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        manifest_entries,
        read_layout_manifest,
        route_by_cluster,
        write_ivf_layout,
    )

    band = (F.col("id") % 4).cast("float")
    emb = (spark.range(400)
           .select(F.col("id").alias("vec_id"),
                   F.array(band, band).alias("embedding")))
    cents = [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]

    surv = {}
    total = {}
    reads = {}
    for split in ("hash", "range"):
        path = str(tmp_path / split)
        write_ivf_layout(emb, cents, dim=2, path=path,
                         files_per_cluster=4, stats_columns=["vec_id"],
                         split=split)
        entries = manifest_entries(path)
        total[split] = len(entries)
        surv[split] = sum(
            1 for _, _, s in entries
            if filestats.survives(_json.loads(s) if s else None,
                                  "vec_id", "=", 123))
        reads[split] = _rows(read_layout_manifest(spark, path)
                             .select("vec_id", "cluster"))
        got = _rows(read_layout_manifest(
            spark, path, file_pred=("vec_id", "=", 123))
            .select("vec_id"))
        assert got == [(123,)], split

    # same logical content either way
    assert reads["hash"] == reads["range"]
    # the composition claim: under the hash salt every file spans the
    # full id range, so an id lookup prunes NOTHING (survivors = all
    # files); contiguous range slices keep ~one file per cluster
    assert surv["hash"] == total["hash"], (surv, total)
    assert surv["range"] < total["range"], (surv, total)
    assert surv["range"] <= len(cents) + 2, (surv, total)
    assert total["range"] == 4 * len(cents), total

    # loud errors on the new knob
    with pytest.raises(ValueError, match="num_clusters"):
        route_by_cluster(emb.withColumn("cluster", F.lit(0)), "vec_id",
                         2, split="range")
    with pytest.raises(ValueError, match="hash.*range|range.*hash"):
        route_by_cluster(emb.withColumn("cluster", F.lit(0)), "vec_id",
                         2, split="zorder")


def test_cnf_prune_or_groups(spark, root):
    """r13: a prune conjunction member may be a LIST of atoms = their
    DISJUNCTION (CNF). Equality vs unpruned+filter, strict-subset
    skipping for a two-range OR on a clustered key, conservative keep
    when one disjunct is unbounded, and loud rejection of an empty OR
    group."""
    df = _clustered_df(spark)
    write_version(df, root, stats_columns=["id", "val"])
    man = _manifest(root, 1)

    # (id < 300 OR id >= 3700): two slivers at opposite ends - both
    # end-files survive, the middle is dropped
    clause = [("id", "<", 300), ("id", ">=", 3700)]
    kept, total = pruned_files(man, [clause])
    assert total == 8 and 1 < len(kept) < total, (kept, total)
    got = sorted(r.id for r in
                 read_version(spark, root, prune=[clause]).collect())
    assert got == list(range(300)) + list(range(3700, 4000))

    # conjunction AND disjunction together:
    # val <= 1000 AND (id < 300 OR id >= 3700) -> only the low sliver
    # (val = 2*id), pruned to fewer files than the OR alone
    both = [("val", "<=", 1000.0), clause]
    kept2, _ = pruned_files(man, both)
    assert 0 < len(kept2) < len(kept), (kept2, kept)
    got2 = sorted(r.id for r in
                  read_version(spark, root, prune=both).collect())
    assert got2 == list(range(300))

    # a no-stats disjunct keeps every file (conservative OR)
    kept3, _ = pruned_files(man, [[("id", "<", 300),
                                   ("ghost", "=", 1)]])
    assert len(kept3) == total

    # empty OR group is a loud caller error
    with pytest.raises(ValueError, match="OR"):
        read_version(spark, root, prune=[("id", "<", 300), []])


def test_layout_file_pred_cnf(spark, tmp_path):
    """read_layout_manifest's file_pred takes the SAME CNF shape as
    read_version's prune= (one shape = one boolean meaning across
    both readers): a nested list is a disjunction - two id
    point-lookups in one pruned scan (the multi-key GDPR delete
    shape) - while a top-level list is a conjunction; an empty list
    is no predicate; an empty OR group raises."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        read_layout_manifest,
    )

    path = str(tmp_path / "lay")
    _fit_tiny_layout(spark, path, stats_columns=["vec_id"])
    got = sorted(r.vec_id for r in read_layout_manifest(
        spark, path,
        file_pred=[[("vec_id", "=", 123), ("vec_id", "=", 377)]])
        .collect())
    assert got == [123, 377]
    # top-level list = AND, same as read_version(prune=...)
    band = read_layout_manifest(
        spark, path, file_pred=[("vec_id", ">=", 100),
                                ("vec_id", "<", 110)])
    assert sorted(r.vec_id for r in band.collect()) == list(range(100, 110))
    # empty list = no predicate
    n_all = read_layout_manifest(spark, path).count()
    assert read_layout_manifest(spark, path, file_pred=[]).count() == n_all
    with pytest.raises(ValueError, match="OR"):
        read_layout_manifest(spark, path,
                             file_pred=[("vec_id", ">=", 0), []])


def test_scan_stats_root_containing_version_dir_name(spark, tmp_path):
    """rsplit hardening: a table ROOT that itself contains a segment
    spelled like the snapshot dir (v00000001) must still produce
    manifest-relative stats keys."""
    import os

    root = str(tmp_path / "v00000001" / "t")
    df = _clustered_df(spark, n=300, files=3)
    write_version(df, root, stats_columns=["id"])
    man = _manifest(root, 1)
    rels = list(man["stats"]["files"])
    assert rels and all("/" not in r for r in rels), rels
    kept, total = pruned_files(man, [("id", "<", 50)])
    assert 0 < len(kept) < total
    got = _rows(read_version(spark, root, prune=("id", "<", 50)))
    assert got == _rows(read_version(spark, root)
                        .filter(F.col("id") < 50))


def test_cnf_prune_equals_filter_property(spark, tmp_path):
    """Property (r13): for RANDOM conjunctions of random disjunction
    groups - mixed ops, null tests, IN-lists, two columns - the pruned
    read equals the unpruned read + filter. Extends the atom property
    above to the full CNF surface."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    root = str(tmp_path / "t")
    df = (spark.range(600)
          .select("id",
                  F.when(F.col("id") % 17 == 0, None)
                  .otherwise((F.col("id") % 97) - 48).alias("k"),
                  (F.col("id") % 7).alias("g"))
          .repartitionByRange(6, "k"))
    write_version(df, root, stats_columns=["k", "g"])
    from etl_pipeline_mini_project_01_spark.sources.versioned import (
        _clause_column,
        _norm_prune,
    )

    atom = st.one_of(
        st.tuples(st.sampled_from(["k", "g"]),
                  st.sampled_from(["=", "<", "<=", ">", ">="]),
                  st.integers(-60, 60)),
        st.tuples(st.sampled_from(["k", "g"]),
                  st.just("between"),
                  st.tuples(st.integers(-60, 0), st.integers(0, 60))),
        st.tuples(st.sampled_from(["k", "g"]),
                  st.just("in"),
                  st.lists(st.integers(-60, 60), min_size=1, max_size=4)),
        st.tuples(st.sampled_from(["k"]),
                  st.sampled_from(["is_null", "is_not_null"]),
                  st.none()),
    )
    clause = st.one_of(atom, st.lists(atom, min_size=1, max_size=3))

    @settings(max_examples=25, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(prune=st.lists(clause, min_size=1, max_size=3))
    def run(prune):
        got = _rows(read_version(spark, root, prune=prune))
        want = read_version(spark, root)
        for cl in _norm_prune(prune):
            want = want.filter(_clause_column(cl))
        assert got == _rows(want), prune

    run()


def test_string_typed_date_predicate_midnight_alignment():
    """r13 review: the midnight-granularity fix must trigger on the
    CANONICAL FORM, not the Python type - a STRING predicate spelled
    like a date (Spark casts it to midnight in the filter) against
    timestamp-column stats has the identical hazard the datetime fix
    closed."""
    s = filestats.survives
    st = {"cols": {"ts": {"min": "2024-02-01 00:00:00",
                          "max": "2024-02-01 00:00:00", "nulls": 0}}}
    # the row at exactly midnight matches all three string-date forms
    assert s(st, "ts", "=", "2024-02-01")
    assert s(st, "ts", "<=", "2024-02-01")
    assert s(st, "ts", "between", ("2024-01-15", "2024-02-01"))
    # and a provably-out-of-range string date still prunes
    assert not s(st, "ts", "<", "2024-02-01")
    assert not s(st, "ts", "=", "2024-01-31")
    # date-shaped string vs NON-temporal bounds: don't-know -> keep
    st2 = {"cols": {"name": {"min": "alice", "max": "zed", "nulls": 0}}}
    assert s(st2, "name", "=", "2024-02-01")


def test_scan_stats_utc_canonical_on_non_utc_host(spark, tmp_path):
    """r13 review: PySpark's collect() hands TIMESTAMP (LTZ) back as
    naive datetimes in the PYTHON PROCESS's OS timezone (via
    datetime.fromtimestamp); the scan collector must re-anchor them to
    the naive-UTC canonical space (what footers record) or a non-UTC
    host writes local bounds that wrongly prune UTC predicate values.
    Simulated by flipping the driver process TZ for the collection."""
    import os
    import time

    root = str(tmp_path / "t")
    df = (spark.range(48)
          .select("id",
                  (F.lit("2024-06-01 00:00:00").cast("timestamp")
                   + F.make_interval(hours=F.col("id"))).alias("ts"))
          .repartitionByRange(4, "id"))
    write_version(df, root, stats_columns=["ts"])
    snap = os.path.join(root, "v00000001")
    footer = filestats.collect_stats(snap, ["ts"])
    prior = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        scan = filestats.stats_via_scan(spark, snap, ["ts"])
    finally:
        if prior is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prior
        time.tzset()
    assert scan == footer
    # and the UTC-host fast path stays identical too
    assert filestats.stats_via_scan(spark, snap, ["ts"]) == footer


def test_scan_stats_snapshot_path_with_space(spark, tmp_path):
    """r13 review: _metadata.file_path is a percent-encoded URI; a
    snapshot path with a space in a parent segment must still map to
    manifest-relative keys (the footer collector always handled it)."""
    root = str(tmp_path / "my snap" / "t")
    df = _clustered_df(spark, n=300, files=3)
    write_version(df, root, stats_columns=["id"])
    man = _manifest(root, 1)
    assert len(man["stats"]["files"]) == 3
    got = _rows(read_version(spark, root, prune=("id", "<", 50)))
    assert got == _rows(read_version(spark, root)
                        .filter(F.col("id") < 50))


def test_scan_stats_dotted_column_name(spark, tmp_path):
    """r13 review: a stats column literally named 'a.b' must resolve
    as the column (backtick-quoted), not a struct path - the footer
    collector matched names exactly."""
    import os

    root = str(tmp_path / "t")
    df = (spark.range(200)
          .select("id", (F.col("id") * 2).alias("a.b"))
          .repartitionByRange(2, "id"))
    write_version(df, root, stats_columns=["a.b"])
    snap = os.path.join(root, "v00000001")
    scan = filestats.stats_via_scan(spark, snap, ["a.b"])
    footer = filestats.collect_stats(snap, ["a.b"])
    assert scan == footer
    assert all("a.b" in st["cols"] for st in scan.values())


def test_scan_stats_parity_ntz_and_nulls_only_types(spark, tmp_path):
    """Parity-matrix extension: timestamp_ntz records bounds with no
    timezone re-anchoring, and the nulls-only types (boolean, decimal)
    record exact null counts but never bounds - identically on both
    collectors."""
    import os

    root = str(tmp_path / "t")
    df = (spark.range(300)
          .select("id",
                  (F.lit("2024-06-01 00:00:00")
                   .cast("timestamp_ntz")
                   + F.make_interval(hours=F.col("id"))).alias("tn"),
                  (F.col("id") % 3 == 0).alias("flag"),
                  F.when(F.col("id") % 5 == 0, None)
                  .otherwise((F.col("id") * 7).cast("decimal(12,2)"))
                  .alias("amt"))
          .repartitionByRange(3, "id"))
    write_version(df, root)
    snap = os.path.join(root, "v00000001")
    cols = ["tn", "flag", "amt"]
    scan = filestats.stats_via_scan(spark, snap, cols)
    footer = filestats.collect_stats(snap, cols)
    assert scan == footer and len(scan) == 3
    for st in scan.values():
        assert "min" in st["cols"]["tn"]          # ntz bounds recorded
        assert "min" not in st["cols"]["flag"]    # nulls-only
        assert "min" not in st["cols"]["amt"]
        assert st["cols"]["amt"]["nulls"] > 0


def test_advice_r13_string_column_midnight_boundaries():
    """ADVICE r13 exact repros: STRING columns holding date/datetime-
    shaped values must not be pruned by strict ops at the midnight
    granularity boundary - the bare-date spelling sorts strictly BELOW
    its own midnight spelling, so the collapse that makes temporal
    alignment work hid real matches. Relaxation is per-operand: only
    the hazardous side loses strictness."""
    s = filestats.survives
    bare = {"rows": 1, "cols": {"c": {"min": "2024-02-01",
                                      "max": "2024-02-01", "nulls": 0}}}
    mid = {"rows": 1, "cols": {"c": {"min": "2024-02-01 00:00:00",
                                     "max": "2024-02-01 00:00:00",
                                     "nulls": 0}}}
    # repro 1: bare-date bounds, '<' midnight predicate - the row
    # '2024-02-01' < '2024-02-01 00:00:00' lexicographically: KEEP
    assert s(bare, "c", "<", "2024-02-01 00:00:00")
    # repro 2: midnight bounds, '>' bare-date predicate - the row
    # '2024-02-01 00:00:00' > '2024-02-01' lexicographically: KEEP
    assert s(mid, "c", ">", "2024-02-01")
    # the NON-hazardous strict directions keep full pruning power:
    # no string in [midnight, midnight] sorts below '2024-02-01',
    assert not s(mid, "c", "<", "2024-02-01")
    # and no string in [bare, bare] sorts above '2024-02-01 00:00:00'
    assert not s(bare, "c", ">", "2024-02-01 00:00:00")
    # away from the boundary, everything still prunes
    assert not s(bare, "c", "<", "2024-01-31 00:00:00")
    assert not s(mid, "c", ">", "2024-02-02")


def test_advice_r13_string_column_prune_equals_filter(spark, root):
    """End-to-end r13 repro: a string column holding mixed bare-date /
    midnight spellings, pruned with strict predicates at the boundary,
    returns exactly the unpruned filtered rows."""
    rows = [("2024-02-01",), ("2024-02-01 00:00:00",),
            ("2024-02-02",), ("2024-01-31 23:59:59",)]
    df = spark.createDataFrame(rows, "c string").repartition(4)
    write_version(df, root, stats_columns=["c"])
    for pred in [("c", "<", "2024-02-01 00:00:00"),
                 ("c", ">", "2024-02-01"),
                 ("c", "<", "2024-02-01"),
                 ("c", ">", "2024-02-01 00:00:00"),
                 ("c", "<=", "2024-02-01"), ("c", ">=", "2024-02-01")]:
        got = _rows(read_version(spark, root, prune=pred))
        want = _rows(read_version(spark, root)
                     .filter(_str_pred(F.col("c"), pred)))
        assert got == want, pred


def _str_pred(c, pred):
    _, op, v = pred
    return {"<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]


def test_empty_prune_clause_rejected():
    """ADVICE r13: an empty clause silently pruned every file through
    pruned_files (raw caller predicates bypass _norm_prune) or raised
    a bare TypeError for an empty tuple - both now fail loudly."""
    with pytest.raises(ValueError, match="empty prune clause"):
        filestats.clause_survives({"rows": 1, "cols": {}}, [])
    with pytest.raises(ValueError, match="empty prune clause"):
        filestats.clause_survives({"rows": 1, "cols": {}}, ())
    man = {"stats": {"columns": ["a"],
                     "files": {"f.parquet": {"rows": 1, "cols": {}}}}}
    with pytest.raises(ValueError, match="empty prune clause"):
        pruned_files(man, [[]])


def test_add_partition_stats_typing_and_nulls():
    """VERDICT r13 #3 unit: key=value path segments become min=max
    stats entries. INT typing is global (every non-null value must be
    a pure integer literal, like Spark's partition-column inference);
    anything else keeps the unescaped string spelling; the hive NULL
    marker records nulls=rows."""
    files = {
        "k=1/a.parquet": {"rows": 3, "cols": {}},
        "k=2/a.parquet": {"rows": 4, "cols": {}},
        "k=__HIVE_DEFAULT_PARTITION__/a.parquet": {"rows": 2, "cols": {}},
    }
    out = filestats.add_partition_stats(files, ["k"])
    assert out["k=1/a.parquet"]["cols"]["k"] == {"min": 1, "max": 1,
                                                 "nulls": 0}
    assert (out["k=__HIVE_DEFAULT_PARTITION__/a.parquet"]["cols"]["k"]
            == {"nulls": 2})
    # one non-integer value anywhere -> the whole column types STRING
    files2 = {"k=01/a.parquet": {"rows": 1, "cols": {}},
              "k=x/a.parquet": {"rows": 1, "cols": {}}}
    out2 = filestats.add_partition_stats(files2, ["k"])
    assert out2["k=01/a.parquet"]["cols"]["k"]["min"] == "01"
    # date-shaped values stay strings (canonical temporal compare)
    files3 = {"d=2024-02-01/a.parquet": {"rows": 1, "cols": {}}}
    out3 = filestats.add_partition_stats(files3, ["d"])
    assert out3["d=2024-02-01/a.parquet"]["cols"]["d"]["min"] == "2024-02-01"
    # hive %XX escaping unescapes; unrequested keys record nothing;
    # physical entries are never overwritten
    files4 = {"s=a%20b/a.parquet": {"rows": 1,
                                    "cols": {"s": {"nulls": 0}}},
              "t=5/a.parquet": {"rows": 1, "cols": {}}}
    out4 = filestats.add_partition_stats(files4, ["s"])
    assert out4["s=a%20b/a.parquet"]["cols"]["s"] == {"nulls": 0}
    assert "t" not in out4["t=5/a.parquet"]["cols"]


def test_partition_value_stats_prune_end_to_end(spark, root):
    """VERDICT r13 #3: `prune=` on a partition key now drops files
    driver-side (Delta's partitionValues treated as min=max) instead
    of relying on the re-applied filter; the hive NULL partition
    answers the null tests exactly."""
    df = (spark.range(1000)
          .select("id",
                  F.when(F.col("id") % 4 == 0, None)
                  .otherwise(F.col("id") % 4).alias("p"),
                  (F.col("id") * 3).alias("x"))
          .repartitionByRange(8, "id"))
    write_version(df, root, partition_by=["p"], stats_columns=["id", "p"])
    man = _manifest(root, 1)
    # equality on the key keeps only that partition's files (plus the
    # all-null hive partition, which by documented contract survives
    # every comparison - NULL never matches, the filter handles it)
    kept, total = pruned_files(man, [("p", "=", 2)])
    assert 0 < len(kept) < total
    assert all("p=2/" in rel or "__HIVE_DEFAULT_PARTITION__" in rel
               for rel in kept)
    assert any("p=2/" in rel for rel in kept)
    got = _rows(read_version(spark, root, prune=("p", "=", 2)))
    want = _rows(read_version(spark, root).filter(F.col("p") == 2))
    assert got == want and len(want) > 0
    # IS NOT NULL drops exactly the hive null partition's files
    kept_nn, _ = pruned_files(man, [("p", "is_not_null")])
    assert all("__HIVE_DEFAULT_PARTITION__" not in rel for rel in kept_nn)
    assert len(kept_nn) < total
    # IS NULL keeps ONLY the null partition (others record nulls=0)
    kept_n, _ = pruned_files(man, [("p", "is_null")])
    assert kept_n and all("__HIVE_DEFAULT_PARTITION__" in rel
                          for rel in kept_n)
    got_n = _rows(read_version(spark, root, prune=("p", "is_null")))
    want_n = _rows(read_version(spark, root).filter(F.col("p").isNull()))
    assert got_n == want_n and len(want_n) > 0
    # range predicate on the int-typed key prunes too
    kept_r, _ = pruned_files(man, [("p", ">=", 3)])
    assert kept_r and all("p=3/" in rel or "__HIVE_DEFAULT_PARTITION__"
                          in rel for rel in kept_r)
    assert any("p=3/" in rel for rel in kept_r)


def test_layout_stats_scheme_routed_collector(spark, tmp_path):
    """VERDICT r13 #5: layout-manifest stats route on the root's
    scheme - a file:// root collects task-side (stats_via_scan,
    no per-footer driver round-trips), a plain root keeps the cheap
    footer loop - and the two manifests are FIELD-IDENTICAL, so the
    route is invisible to every consumer."""
    from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (
        manifest_entries,
        read_layout_manifest,
    )

    plain = str(tmp_path / "lay_plain")
    uri = f"file://{tmp_path}/lay_uri"
    _fit_tiny_layout(spark, plain, stats_columns=["vec_id"])
    _fit_tiny_layout(spark, uri, stats_columns=["vec_id"])
    ep = {rel: s for _, rel, s in manifest_entries(plain)}
    eu = {rel: s for _, rel, s in manifest_entries(uri)}
    # same file-naming convention modulo Spark's random part names:
    # compare the per-cluster multiset of stats payloads
    def by_cluster(entries):
        out = {}
        for rel, s in entries.items():
            out.setdefault(rel.split("/", 1)[0], []).append(s)
        return {c: sorted(v) for c, v in out.items()}
    assert by_cluster(ep) == by_cluster(eu)
    assert all(s is not None for s in eu.values())
    # and the scheme root's pruned read behaves identically
    got = _rows(read_layout_manifest(
        spark, uri, file_pred=("vec_id", "=", 123)).select("vec_id"))
    assert got == [(123,)]


def test_partitioned_commit_records_partition_stats_by_default(spark, root):
    """r14 Delta parity: partition keys enter the stats set
    UNCONDITIONALLY for partitioned commits - a stats-less partitioned
    commit records a partition-only stats block through pure path
    parsing (no Spark job, no footer IO), and stats_columns commits
    get the partition keys auto-unioned."""
    df = (spark.range(400)
          .select("id", (F.col("id") % 4).alias("p"))
          .repartitionByRange(4, "id"))
    # no stats_columns at all: partition-only block
    write_version(df, root, partition_by=["p"])
    man = _manifest(root, 1)
    assert man["stats"]["columns"] == ["p"]
    kept, total = pruned_files(man, [("p", "=", 2)])
    assert 0 < len(kept) < total
    assert all("p=2/" in rel for rel in kept)
    got = _rows(read_version(spark, root, 1, prune=("p", "=", 2)))
    want = _rows(read_version(spark, root, 1).filter(F.col("p") == 2))
    assert got == want and len(want) == 100
    # stats_columns commit: partition key auto-unioned into the set
    write_version(df, root, partition_by=["p"], stats_columns=["id"])
    man2 = _manifest(root, 2)
    assert man2["stats"]["columns"] == ["id", "p"]
    kept2, total2 = pruned_files(man2, [("p", ">=", 3)])
    assert 0 < len(kept2) < total2
    # an UNPARTITIONED stats-less commit still records no stats block
    write_version(spark.range(10).select("id"), root)
    assert "stats" not in _manifest(root, 3)
