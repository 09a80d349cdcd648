"""r14 curve: differential vs rewrite upsert commits (VERDICT r13 #2).

Measures, for growing micro-batch counts over a fixed 200k-key table,
per-mode: total rows PHYSICALLY WRITTEN across all versions (the write
amplification the differential mode exists to remove), commit wall,
final-read wall, and read equality between the modes. Rewrite-mode
bytes grow quadratically with batch count (each commit rewrites the
cumulative table); differential stays linear (each commit stages its
batch alone) plus one optional compaction fold at the end.

Usage: python tools/r14_sink_curve.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.session import get_spark
from etl_pipeline_mini_project_01_spark.sources.versioned import (
    compact_latest,
    list_versions,
    read_version,
)
from etl_pipeline_mini_project_01_spark.streaming.versioned_sink import (
    commit_batch_versioned,
)

KEYS = 200_000


def run_mode(spark, root, n_batches, differential):
    """Commit n_batches equal slices of the key space (every batch
    updates its slice's values), return metrics."""
    per = KEYS // n_batches
    t0 = time.perf_counter()
    for i in range(n_batches):
        b = (spark.range(i * per, (i + 1) * per)
             .select(F.col("id").alias("k"),
                     (F.col("id") * 1.0 + i).alias("v"))
             .repartition(4))
        commit_batch_versioned(b, root, keys=["k"],
                               differential=differential)
    commit_wall = time.perf_counter() - t0
    rows_written = 0
    for v in list_versions(root):
        rows_written += spark.read.parquet(
            os.path.join(root, f"v{v:08d}")).count()
    t0 = time.perf_counter()
    final_rows = read_version(spark, root).count()
    read_wall = time.perf_counter() - t0
    compact_wall = None
    if differential:
        t0 = time.perf_counter()
        compact_latest(spark, root)
        compact_wall = time.perf_counter() - t0
    return {"commit_wall_s": round(commit_wall, 2),
            "rows_written": rows_written,
            "final_rows": final_rows,
            "read_wall_s": round(read_wall, 2),
            "compact_wall_s": (round(compact_wall, 2)
                               if compact_wall is not None else None)}


def main():
    spark = get_spark("r14curve", master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="r14curve_")
    out = {"keys": KEYS, "points": []}
    try:
        for n in (4, 8, 16):
            pt = {"n_batches": n}
            for mode in ("rewrite", "differential"):
                root = os.path.join(base, f"{mode}_{n}")
                pt[mode] = run_mode(spark, root, n,
                                    differential=(mode == "differential"))
            # equality of the two modes' final state
            a = read_version(spark, os.path.join(base, f"rewrite_{n}"))
            b = read_version(spark, os.path.join(base, f"differential_{n}"))
            pt["modes_equal"] = (a.exceptAll(b).count() == 0
                                 and b.exceptAll(a).count() == 0)
            pt["write_amplification_rewrite"] = round(
                pt["rewrite"]["rows_written"] / KEYS, 2)
            pt["write_amplification_differential"] = round(
                pt["differential"]["rows_written"] / KEYS, 2)
            out["points"].append(pt)
            print(json.dumps(pt))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r14_sink_curve.json"
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
