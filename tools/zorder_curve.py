"""SCALE_CURVE point for z-order clustering (operators/zorder.py):
what the Morton rewrite COSTS at write time vs a plain linear-sort
clustered write, and what it BUYS - file skipping on the second
column, which the linear layout cannot give at any price.

Usage: python tools/zorder_curve.py [out.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_mini_project_01_spark.operators.zorder import (  # noqa: E402
    write_version_zordered,
)
from etl_pipeline_mini_project_01_spark.session import get_spark  # noqa: E402
from etl_pipeline_mini_project_01_spark.sources import fsio  # noqa: E402
from etl_pipeline_mini_project_01_spark.sources.versioned import (  # noqa: E402
    pruned_files,
    read_version,
    write_version,
)

POINTS = {"10x": 800_000, "30x": 2_400_000, "100x": 8_000_000}
ROWS_PER_FILE = 50_000


def _wall(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark("zorder-curve")
    out: dict[str, dict] = {}
    for label, n in POINTS.items():
        files = n // ROWS_PER_FILE
        df = (spark.range(n)
              .select("id",
                      (F.col("id") % 99_991).alias("x"),
                      ((F.col("id") * 7919 + 13) % 99_989).alias("y"),
                      F.sha2(F.col("id").cast("string"), 256)
                      .alias("payload")))
        d = tempfile.mkdtemp(prefix="zcurve_")
        zroot, lroot = d + "/z", d + "/lin"
        t_z = _wall(lambda: write_version_zordered(
            df, zroot, ["x", "y"], num_files=files))
        t_l = _wall(lambda: write_version(
            df.repartitionByRange(files, "x"), lroot,
            stats_columns=["x", "y"]))
        zman = fsio.read_json(f"{zroot}/_versions/v00000001.json")
        lman = fsio.read_json(f"{lroot}/_versions/v00000001.json")
        predx = ("x", "between", (50_000, 50_999))   # ~1% of domain
        predy = ("y", "between", (50_000, 50_999))
        stats = {}
        for tag, man in (("zorder", zman), ("linear", lman)):
            kx, tx = pruned_files(man, [predx])
            ky, ty = pruned_files(man, [predy])
            stats[tag] = {"files": tx, "x_survivors": len(kx),
                          "y_survivors": len(ky)}

        def _lookup(root, pred):
            return read_version(spark, root, prune=pred).count()

        _lookup(zroot, predy), _lookup(lroot, predy)      # warm-up
        out[label] = {
            "rows": n,
            "write_zorder_sec": t_z,
            "write_linear_sec": t_l,
            "layout": stats,
            "y_lookup_zorder_sec": _wall(
                lambda: _lookup(zroot, predy)),
            "y_lookup_linear_sec": _wall(
                lambda: _lookup(lroot, predy)),
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
