"""SCALE_CURVE points for the round-13 surface (VERDICT r12 #3/#8):

(a) `r13_task_side_stats` - commit-time stats collection cost, the
    task-side Spark-aggregation collector (filestats.stats_via_scan,
    the r13 default for versioned commits) vs the driver footer loop
    (collect_stats), at growing file counts on a local FS - plus a
    live field-identity assertion between the two at every point.
    Local disks favor the footer loop (a footer open is ~0.1 ms);
    the scan's win condition is per-footer IO round-trips (object
    stores) and schemes executors' plain pyarrow can't read - the
    same pricing discipline as the r12 fan-out bullet.

(b) `r13_range_split_point_lookup` - the z-order x IVF composition:
    an id point-lookup through read_layout_manifest(file_pred=) on a
    cluster-partitioned layout whose within-cluster files are split
    by hash salt (every file spans the cluster's id range - stats
    prune nothing) vs by contiguous range slices (route_by_cluster
    split='range'). Cluster is DECORRELATED from id (id % k), so the
    contrast is the split's doing.

Usage: python tools/r13_curve.py [scale_curve.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_mini_project_01_spark.session import get_spark  # noqa: E402
from etl_pipeline_mini_project_01_spark.operators.ivf_layout import (  # noqa: E402
    manifest_entries,
    read_layout_manifest,
    write_ivf_layout,
)
from etl_pipeline_mini_project_01_spark.sources import filestats  # noqa: E402


def stats_points(spark) -> dict:
    out = {}
    for label, nfiles in (("16f", 16), ("160f", 160), ("800f", 800)):
        rows = nfiles * 10_000
        d = tempfile.mkdtemp(prefix="r13stats_")
        snap = d + "/snap"
        (spark.range(rows)
         .select("id", (F.col("id") % 997).alias("k"),
                 F.format_string("u%09d", "id").alias("name"))
         .repartitionByRange(nfiles, "id")
         .write.parquet(snap))
        cols = ["id", "k", "name"]
        filestats.stats_via_scan(spark, snap, cols)   # warm both paths
        filestats.collect_stats(snap, cols)
        t0 = time.perf_counter()
        s_scan = filestats.stats_via_scan(spark, snap, cols)
        t1 = time.perf_counter()
        s_foot = filestats.collect_stats(snap, cols)
        t2 = time.perf_counter()
        assert s_scan == s_foot, f"parity break at {label}"
        out[label] = {"files": nfiles, "rows": rows,
                      "scan_job_sec": round(t1 - t0, 3),
                      "footer_driver_sec": round(t2 - t1, 3),
                      "field_identical": True}
        shutil.rmtree(d, ignore_errors=True)
    return out


def range_split_points(spark) -> dict:
    out = {}
    k = 8
    cents = [[float(j)] * 4 for j in range(k)]
    for label, rows in (("100k", 100_000), ("1M", 1_000_000)):
        band = (F.col("id") % k).cast("float")
        emb = (spark.range(rows)
               .select(F.col("id").alias("vec_id"),
                       F.array(band, band, band, band).alias("embedding")))
        point = rows // 3
        rec = {"rows": rows, "clusters": k, "files_per_cluster": 8}
        for split in ("hash", "range"):
            d = tempfile.mkdtemp(prefix=f"r13rs_{split}_")
            path = d + "/lay"
            t0 = time.perf_counter()
            write_ivf_layout(emb, cents, dim=4, path=path,
                             files_per_cluster=8,
                             stats_columns=["vec_id"], split=split)
            t1 = time.perf_counter()
            entries = manifest_entries(path)
            surv = sum(1 for _, _, s in entries
                       if filestats.clause_survives(
                           json.loads(s) if s else None,
                           ("vec_id", "=", point)))
            t2 = time.perf_counter()
            got = read_layout_manifest(
                spark, path, file_pred=("vec_id", "=", point)).collect()
            t3 = time.perf_counter()
            assert [r["vec_id"] for r in got] == [point], split
            rec[split] = {"build_sec": round(t1 - t0, 3),
                          "files_total": len(entries),
                          "files_survived": surv,
                          "lookup_pruned_sec": round(t3 - t2, 3)}
            shutil.rmtree(d, ignore_errors=True)
        out[label] = rec
    return out


def main() -> int:
    curve_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_CURVE.json"
    spark = get_spark("r13-curve", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    stats = stats_points(spark)
    rsplit = range_split_points(spark)

    doc = json.load(open(curve_path))
    doc["rounds"]["r13_task_side_stats"] = {
        "scenario": ("commit-time per-file stats collection on a local "
                     "FS at fixed 10k rows/file: the r13 task-side Spark "
                     "aggregation job (stats_via_scan, default for "
                     "versioned commits) vs the driver footer loop "
                     "(collect_stats); outputs asserted field-identical "
                     "at every point (tools/r13_curve.py)"),
        "points": stats,
        "finding": ("the scan job is ~flat (Spark job overhead dominates "
                    "at these scales) while the local footer loop stays "
                    "near-free - locally the footer path wins, which is "
                    "why it remains the layout-manifest collector; the "
                    "scan's win condition is per-footer IO round-trips "
                    "(object-store GETs) and scheme-qualified roots, "
                    "where the footer loop is serial driver-side "
                    "latency x files and the scan is one distributed "
                    "column-pruned job"),
    }
    doc["rounds"]["r13_range_split_point_lookup"] = {
        "scenario": ("IVF cluster-partitioned layout, 8 clusters x 8 "
                     "files, cluster DECORRELATED from id (id % k); one "
                     "id equality through read_layout_manifest("
                     "file_pred=) under the hash file salt vs "
                     "route_by_cluster(split='range') contiguous id "
                     "slices (tools/r13_curve.py)"),
        "points": rsplit,
        "finding": ("under the hash salt the per-(cluster,file) stats "
                    "prune NOTHING for id predicates (survivors = all "
                    "files); range slices keep ~1 file per cluster at "
                    "every scale - the delete/GDPR access path - for a "
                    "comparable build cost (range exchange vs hash "
                    "exchange, both one shuffle)"),
    }
    json.dump(doc, open(curve_path, "w"), indent=1)
    print(json.dumps({"r13_task_side_stats": stats,
                      "r13_range_split_point_lookup": rsplit}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
