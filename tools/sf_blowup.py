"""Synthesize an ~sf1.0 dataset as a duplication-rate-preserving 10x
blow-up of the harness sf0.1 tables (VERDICT r9 #6: the driver ships
sf<=0.1, but the determinism recipes - decimal sums, md5 thresholds,
interval ties - should be proven a decade past the recorded sf0.1
full-battery sweep before the registered set grows again).

Key remapping is CONSISTENT across tables (key' = key*N + r with the
same replica index r on both sides of every FK), so every join
relationship of the base data holds replica-by-replica; nation/region
stay constant (dims). documents get the same every-other-word salt as
tools/scale_curve.synthesize (duplication-rate preserving for the
dedup family); embeddings get the same deterministic nudge (near-dup
structure preserved). DuckDB oracles run on the SAME parquet, so the
sweep checks the engine's determinism at scale, not the synthesis.

Usage: python tools/sf_blowup.py [N] [out_dir]
       then: python tests/driver_mimic.py <out_dir>
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_pipeline_mini_project_01_spark.catalog import load_table  # noqa: E402
from etl_pipeline_mini_project_01_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

#: key columns remapped as key*N + r, per table (FK pairs share the
#: same formula and replica index, preserving every join).
KEYMAP: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
}


def _write_single(df, out: str, table: str) -> None:
    """One FILE per table (like the harness testdata - DuckDB oracle
    views read `<dir>/<t>.parquet` as a file, not a directory)."""
    import shutil

    stage = os.path.join(out, f"._stage_{table}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in sorted(os.listdir(stage))
                if f.endswith(".parquet") and not f.startswith(("_", ".")))
    dst = os.path.join(out, f"{table}.parquet")
    if os.path.exists(dst):
        os.remove(dst)
    os.rename(os.path.join(stage, part), dst)
    shutil.rmtree(stage, ignore_errors=True)


def blow_up(spark, n: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    r = F.col("r")
    rng = spark.range(n).withColumnRenamed("id", "r")

    for t in ("region", "nation"):            # constant dims: copy
        _write_single(load_table(spark, BASE_SF, t), out, t)

    for t, keys in KEYMAP.items():
        df = load_table(spark, BASE_SF, t)
        cols = [((F.col(c) * n + r).alias(c) if c in keys else F.col(c))
                for c in df.columns]
        _write_single(df.crossJoin(rng).select(*cols), out, t)

    docs = load_table(spark, BASE_SF, "documents")
    salted = F.concat_ws(" ", F.transform(
        F.split(F.col("text"), r"\s+"),
        lambda w, i: F.when(i % 2 == 1,
                            F.concat(w, F.lit("_"), r.cast("string")))
        .otherwise(w)))
    _write_single(
        docs.crossJoin(rng)
        .select((F.col("doc_id") * n + r).alias("doc_id"),
                F.when(r == 0, F.col("text")).otherwise(salted).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")]),
        out, "documents")

    emb = load_table(spark, BASE_SF, "embeddings")
    nudged = F.transform(
        "embedding",
        lambda v, i: (v.cast("double")
                      + r.cast("double") * 0.001
                      * ((i % 7).cast("double") - 3.0)).cast("float"))
    _write_single(
        emb.crossJoin(rng)
        .select((F.col("vec_id") * n + r).alias("vec_id"),
                nudged.alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")]),
        out, "embeddings")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scratch", f"sfblow{n}x")
    spark = get_spark("sf-blowup",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    blow_up(spark, n, out)
    print(out)


if __name__ == "__main__":
    main()
