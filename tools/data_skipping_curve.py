"""SCALE_CURVE point for manifest data skipping (VERDICT r11 #3).

Scenario: a key-range-clustered versioned table (the id-locality a
daily-appended corpus has naturally), a SELECTIVE point/range lookup on
the clustering key - the reference serves this query class from its
b-tree indexes (models/bronze/02:90-94); a lake table without
add-action stats must open every live file of the snapshot.

At each scale point the table doubles its file count with its rows
(fixed target rows-per-file, the 100 TB operating shape), and we
measure the SAME lookup three ways:
  * full   - read_version().filter(...): every file listed + scanned
             (parquet row-group skipping still applies inside files);
  * pruned - read_version(prune=...): survivor files only, resolved
             from the KB-sized manifest;
  * files  - kept/total from the manifest alone (the structural claim:
             survivors stay O(1) while total grows linearly).

Usage: python tools/data_skipping_curve.py [out.json]
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
from etl_pipeline_mini_project_01_spark.sources import fsio  # noqa: E402
from etl_pipeline_mini_project_01_spark.sources.versioned import (  # noqa: E402
    pruned_files,
    read_version,
    write_version,
)

#: rows per output file - fixed, so files grow linearly with rows
ROWS_PER_FILE = 50_000
POINTS = {"10x": 800_000, "30x": 2_400_000, "100x": 8_000_000}


def _wall(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark("data-skipping-curve")
    out: dict[str, dict] = {}
    for label, n in POINTS.items():
        d = tempfile.mkdtemp(prefix="dskip_curve_")
        root = d + "/t"
        files = n // ROWS_PER_FILE
        df = (spark.range(n)
              .select(F.col("id").alias("k"),
                      (F.col("id") % 997).cast("double").alias("v"),
                      F.sha2(F.col("id").cast("string"), 256)
                      .alias("payload"))
              .repartitionByRange(files, "k"))
        t_commit = _wall(lambda: write_version(df, root,
                                               stats_columns=["k"]))
        man = fsio.read_json(f"{root}/_versions/v00000001.json")
        pred = ("k", "between", (n // 2, n // 2 + 999))
        kept, total = pruned_files(man, [pred])

        def _full():
            assert (read_version(spark, root)
                    .filter(F.col("k").between(n // 2, n // 2 + 999))
                    .count()) == 1000

        def _pruned():
            assert read_version(spark, root, prune=pred).count() == 1000

        # warm both plans once, then measure the repeat (codegen noise)
        _full(), _pruned()
        out[label] = {
            "rows": n,
            "files_total": total,
            "files_survived": len(kept),
            "commit_with_stats_sec": t_commit,
            "lookup_full_scan_sec": _wall(_full),
            "lookup_pruned_sec": _wall(_pruned),
        }
        print(label, json.dumps(out[label]), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
