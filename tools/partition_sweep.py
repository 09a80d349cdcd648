"""Registry-wide partition-count determinism sweep (round-5 audit made
a reusable tool; the class of check that caught the shard packer's
sampled-range nondeterminism). Every registered query runs under two
different spark.sql.shuffle.partitions settings on fresh sessions and
the CANONICALIZED results (sorted rows, dtype-tagged scalars - the
driver_mimic canon) must be bit-identical: the portability property a
1000-executor cluster needs, since the driver's own partition count is
whatever its cluster happens to size.

Usage: python tools/partition_sweep.py [sf_dir] [parts_a] [parts_b] [names]
       (defaults: /root/testdata/sf0.001, 3, 32, all registered queries;
       `names` is a comma-separated registry subset for incremental
       re-checks of new/changed queries)
Prints one JSON line {"queries": N, "mismatches": [...], "errors":
[...]}; exit code 0 only when both lists are empty.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def run_all(sf_dir: str, parts: int,
            only: frozenset[str] = frozenset()) -> dict[str, object]:
    """One fresh session at `parts` shuffle partitions -> {name: canon}."""
    from pyspark.sql import SparkSession

    from driver_mimic import canon
    from etl_pipeline_mini_project_01_spark.plans import registry
    from etl_pipeline_mini_project_01_spark.session import harden

    spark = harden(SparkSession.builder.master("local[8]")
                   .appName(f"psweep-{parts}")
                   .config("spark.sql.shuffle.partitions", str(parts))
                   .config("spark.ui.showConsoleProgress", "false")
                   .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all_plans()
    out: dict[str, object] = {}
    for name, fn in registry.QUERIES.items():
        if only and name not in only:
            continue
        try:
            pdf = fn(spark, sf_dir).toPandas()
            pdf = pdf[sorted(pdf.columns)]
            rows = sorted(tuple(canon(v) for v in row)
                          for row in pdf.itertuples(index=False, name=None))
            out[name] = (tuple(pdf.columns), tuple(rows))
        except Exception as e:  # noqa: BLE001 - report, don't abort sweep
            out[name] = f"ERROR: {type(e).__name__}: {e}"
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    pa = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pb = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    only = (frozenset(sys.argv[4].split(","))
            if len(sys.argv) > 4 else frozenset())
    ra = run_all(sf_dir, pa, only)
    rb = run_all(sf_dir, pb, only)
    errors = sorted(n for n in ra
                    if isinstance(ra[n], str) or isinstance(rb.get(n), str))
    mismatches = sorted(n for n in ra
                        if n not in errors and ra[n] != rb.get(n))
    print(json.dumps({"sf_dir": sf_dir, "parts": [pa, pb],
                      "queries": len(ra), "mismatches": mismatches,
                      "errors": errors}))
    sys.exit(0 if not mismatches and not errors else 1)


if __name__ == "__main__":
    main()
