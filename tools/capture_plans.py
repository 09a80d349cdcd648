"""Capture .explain("formatted") for headline queries into plans/r14/.

Usage: python tools/capture_plans.py <suffix> [name ...]

Writes plans/r14/<query>_<suffix>.txt for each requested headline query
(default: all). Composite contract rows (versioned_stream_sink,
ivf_generation_swap, txn/zorder/day2 step rows) RUN side effects while
building their DataFrame - their returned frame is the steps relation,
which is what gets explained; the note at the top of each file says so.

The explain goes through Spark's own formatted explain of the final
DataFrame the bench times, so Exchange counts / join strategies /
PushedFilters in these files are exactly what the noop-sink write
executes (modulo AQE's runtime re-planning, which `explain` shows as
AdaptiveSparkPlan isFinalPlan=false).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_mini_project_01_spark.plans import registry  # noqa: E402
from etl_pipeline_mini_project_01_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    import bench

    names = sys.argv[2:] or [n for n in bench.HEADLINE]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("capture-plans", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all_plans()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in registry.QUERIES:
            print(f"skip {name}: not registered")
            continue
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        dt = time.perf_counter() - t0
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(f"-- {name} ({suffix}) explain('formatted') at "
                     f"{sf_dir}, build+explain {dt:.1f}s\n")
            fh.write(plan)
        print(f"wrote {path} [{dt:.1f}s]")
    spark.stop()


if __name__ == "__main__":
    main()
