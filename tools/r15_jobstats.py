"""Executed-job evidence for contract rows (VERDICT r14 #5): run a
registered query to completion through the noop sink and record what
ACTUALLY executed - job count, stage count, task count, shuffle
read/write bytes, input bytes - from the driver's own status REST API
(localhost-only; the same numbers the Spark UI shows). `explain` shells
out to `LocalTableScan` for rows whose work happens in streaming
triggers and driver-sequenced jobs; this captures the executed truth
instead.

Usage: python tools/r15_jobstats.py <row> [row ...]
       SPARK_GRAFT_JOBSTATS_OUT=plans/r15/jobstats.json (append-merged)

Each row's record: {"jobs": N, "stages": N, "tasks": N,
"shuffle_read_bytes": N, "shuffle_write_bytes": N, "input_bytes": N,
"wall_sec": s}. Runs in ONE warm JVM; each row is measured as the
delta of the application's stage/job lists across its execution."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_mini_project_01_spark.plans import registry  # noqa: E402
from etl_pipeline_mini_project_01_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def _snapshot(spark) -> tuple[set[int], set[tuple[int, int]]]:
    jobs = {j["jobId"] for j in _api(spark, "jobs")}
    stages = {(s["stageId"], s["attemptId"])
              for s in _api(spark, "stages")}
    return jobs, stages


def _measure(spark, name: str) -> dict:
    fn = registry.QUERIES[name]
    jobs0, stages0 = _snapshot(spark)
    spark.sparkContext.setJobDescription(f"jobstats: {name}")
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    jobs1, _ = _snapshot(spark)
    # stage detail AFTER the run, restricted to new stage attempts
    detail = _api(spark, "stages")
    new = [s for s in detail
           if (s["stageId"], s["attemptId"]) not in stages0]
    rec = {
        "jobs": len(jobs1 - jobs0),
        "stages": len(new),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in new),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0)
                                  for s in new),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0)
                                   for s in new),
        "input_bytes": sum(s.get("inputBytes", 0) for s in new),
        "wall_sec": round(wall, 3),
    }
    # drop this row's dead checkpoint blocks so rows stay independent
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in list(jmap.values()):
        jrdd.unpersist()
    return rec


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("r15-jobstats", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  "spark.ui.enabled": "true",
                                  "spark.ui.retainedJobs": "10000",
                                  "spark.ui.retainedStages": "10000"})
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all_plans()
    # warm the JVM/python-worker path once (excluded)
    registry.QUERIES["g6_daily_event_trends"](spark, SF).limit(1).collect()
    out: dict[str, dict] = {}
    for name in sys.argv[1:]:
        rec = _measure(spark, name)
        out[name] = rec
        print(f"{name}: {json.dumps(rec)}")
    path = os.environ.get("SPARK_GRAFT_JOBSTATS_OUT")
    if path:
        merged = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                merged = json.load(fh)
        merged.update(out)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
            fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
