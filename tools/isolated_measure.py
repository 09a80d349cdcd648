"""Isolated single-stage re-measure (VERDICT r10 #5): time individual
headline queries with ONE FRESH JVM PER (tree, query) - the
SCALE_CURVE discipline - to separate real plan regressions from
container drift. The r10 bench showed the k-means/IVF family +17..38%
while 25 of 33 queries improved; two of the four regressing queries
touch no r10-changed code, so drift was the hypothesis - this tool
measures it instead of asserting it.

Usage:
    python tools/isolated_measure.py TREE_DIR QUERY [QUERY...]
        -> one JSON line per query: {"tree": ..., "query": ...,
           "cold": s, "warm": s}   (warm = 2nd in-JVM run, matching
           bench.py's warm-pass convention)

Run it once against the current tree and once against a historical
tree (git worktree of the old round's final commit) under the same
container conditions; a uniform tree-to-tree delta = drift, a skewed
one = a regressing commit to bisect.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_CHILD = """
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from etl_pipeline_mini_project_01_spark.plans import registry
from etl_pipeline_mini_project_01_spark.session import get_spark
from pyspark.sql import Observation
from pyspark.sql import functions as F

tree, name, sf_dir, cpus = sys.argv[1:5]
spark = get_spark("isolated-measure", master=f"local[{cpus}]",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
registry.load_all_plans()

def consume(df):
    obs = Observation()
    (df.observe(obs, F.count(F.lit(1)).alias("rows"))
       .write.format("noop").mode("overwrite").save())
    return int(obs.get["rows"])

# warm-up outside the timings, like bench.py
registry.QUERIES[name](spark, sf_dir).limit(1).collect()
walls = []
for _ in range(2):
    t0 = time.perf_counter()
    consume(registry.QUERIES[name](spark, sf_dir))
    walls.append(round(time.perf_counter() - t0, 3))
spark.stop()
sys.stdout.flush()
print(json.dumps({"tree": tree, "query": name,
                  "cold": walls[0], "warm": walls[-1]}))
"""


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    tree = os.path.abspath(sys.argv[1])
    queries = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    for q in queries:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, tree, q, sf_dir, cpus],
            capture_output=True, text=True, timeout=900)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ""
        if proc.returncode != 0 or not line.startswith("{"):
            print(json.dumps({"tree": tree, "query": q, "error":
                              (proc.stderr or "no output")[-300:]}))
            continue
        rec = json.loads(line)
        rec["jvm_total"] = round(time.time() - t0, 1)
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
