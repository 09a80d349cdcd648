"""Standalone driver-mimic: plain foreign SparkSession + the full
queries()/oracle_sql() contract at a chosen SF (default sf0.01), exactly
as the grading driver runs it. Usage: python tests/driver_mimic.py [sf_dir]
"""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import math
import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", "nan" if math.isnan(v) else repr(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(canon(x) for x in v))
    return (type(v).__name__, v)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[8]")
             .appName("driver-mimic").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rows = mod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")

    qs, oracles = mod.queries(), mod.oracle_sql()
    failures = 0
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error {str(exc)[:200]}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows [{dt:.1f}s]")
            continue
        rel = con.sql(oracles[name])
        dcols, drows = list(rel.columns), rel.fetchall()
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        a = sorted((tuple(canon(r[i]) for i in order_s) for r in srows), key=repr)
        b = sorted((tuple(canon(r[i]) for i in order_d) for r in drows), key=repr)
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            failures += 1
        elif a != b:
            diff = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y) \
                if len(a) == len(b) else ("len", len(a), len(b))
            print(f"FAIL {name}: value mismatch {diff!r:.300}")
            failures += 1
        else:
            print(f"ok   {name}: MATCH {len(srows)} rows [{dt:.1f}s]")
    print(f"\n{len(qs)} queries, {len(oracles)} oracles, {failures} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
