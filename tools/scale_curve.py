"""Scale-curve harness (VERDICT r3 #7): measure the heavyweight
flagships - distributed k-means, SemDeDup (flat AND two-level),
the end-to-end training-mix chain, substring-span dedup, and the
multi-table LSH ANN - at 1x (sf0.1) and Nx (synthesized), so the
sub-quadratic design claims are MEASURED, not asserted.

Blow-up construction (deterministic, duplication-rate preserving):
  * documents: each source doc becomes N replicas with distinct doc_ids
    (doc_id * N + r). Replica 0 keeps the original text; replicas r>0
    suffix every odd-position token with `_r`, so every 3-gram shingle
    of a replica contains at least one salted token - replicas of the
    SAME doc share no shingles across r, while the fixture's planted
    near-dup PAIRS stay near-dups within every replica (both members
    get the same transformation). Near-dup pair count therefore scales
    LINEARLY with N (the honest corpus-growth model); naive text
    duplication would instead make every replica family an N-clique and
    grow the pair graph quadratically in N - measuring that would test
    the fixture, not the operator.
  * embeddings: vec_id * N + r, each component nudged by a replica- and
    dim-dependent epsilon (r * 1e-3 * ((dim % 7) - 3)) - distinct
    vectors, same overall geometry.

Operating points follow each operator's documented 100 TB rule:
  * k-means: k fixed (8), iters fixed (2) - cost model is O(n * k * d)
    per iteration, so the expectation at Nx is ~Nx wall;
  * SemDeDup: k scales WITH the corpus (8 -> 8N) to hold cluster size
    constant - the module docstring's "choose k so clusters stay
    tractable" contract; expectation ~Nx wall;
  * training mix: LSH + CC + packing, candidate counts linear in the
    (linear) duplication rate; expectation ~Nx wall.

Usage: python tools/scale_curve.py [N]   (default 10)
Writes the synthesized tables under .scratch/scale{N}x/ (gitignored)
and prints one JSON line with per-flagship walls at both scales plus
the wall ratio per flagship (ratio / N <= ~1 means at-or-better-than-
linear scaling at this size).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.operators.kmeans import kmeans_assign
from etl_pipeline_mini_project_01_spark.operators.mix import (
    assemble_training_shards,
)
from etl_pipeline_mini_project_01_spark.operators.semdedup import (
    semdedup,
    semdedup_twolevel,
)
from etl_pipeline_mini_project_01_spark.session import get_spark

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Assignment kernel for the k-means/SemDeDup points. Default 'matmul':
#: the curve measures the PRODUCTION operating point, and at the
#: cluster-size-constant rule k grows with the corpus - the 100x run
#: with the bit-exact 'vectorized' kernel measured 402 s of SemDeDup's
#: 446 s inside assignment alone (k*dim interpreter-dispatched numpy
#: ops per batch), i.e. it measured kernel dispatch overhead, not the
#: operator's scaling shape. Set SPARK_GRAFT_CURVE_KERNEL=vectorized to
#: reproduce that run.
KERNEL = os.environ.get("SPARK_GRAFT_CURVE_KERNEL", "matmul")


def synthesize(spark, n: int) -> str:
    out = os.path.join(REPO, ".scratch", f"scale{n}x")
    docs = load_table(spark, BASE_SF, "documents")
    r = F.col("r")
    salted = F.concat_ws(" ", F.transform(
        F.split(F.col("text"), r"\s+"),
        lambda w, i: F.when(i % 2 == 1,
                            F.concat(w, F.lit("_"), r.cast("string")))
        .otherwise(w)))
    (docs.crossJoin(spark.range(n).withColumnRenamed("id", "r"))
     .select((F.col("doc_id") * n + r).alias("doc_id"),
             F.when(r == 0, F.col("text")).otherwise(salted).alias("text"),
             *[c for c in docs.columns if c not in ("doc_id", "text")])
     .write.mode("overwrite").parquet(os.path.join(out, "documents.parquet")))

    emb = load_table(spark, BASE_SF, "embeddings")
    nudged = F.transform(
        "embedding",
        lambda v, i: (v.cast("double")
                      + r.cast("double") * 0.001
                      * ((i % 7).cast("double") - 3.0)).cast("float"))
    (emb.crossJoin(spark.range(n).withColumnRenamed("id", "r"))
     .select((F.col("vec_id") * n + r).alias("vec_id"),
             nudged.alias("embedding"),
             *[c for c in emb.columns if c not in ("vec_id", "embedding")])
     .write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet")))
    return out


def _consume(df) -> None:
    """Force FULL computation of every output column. A bare count()
    lets Catalyst prune: a left join on a unique key preserves
    cardinality, so count(final join) can collapse to count(left) and
    skip the entire analysis - the noop sink evaluates all columns of
    every row without collecting them to the driver."""
    df.write.format("noop").mode("overwrite").save()


def run_flagships(spark, sf_dir: str, k_clusters: int) -> dict[str, float]:
    from etl_pipeline_mini_project_01_spark.plans.dedup import (
        substring_spans,
    )
    from etl_pipeline_mini_project_01_spark.plans.similarity import (
        ann_multitable_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    walls: dict[str, float] = {}

    t0 = time.perf_counter()
    _consume(kmeans_assign(emb, k=8, iters=2, kernel=KERNEL))
    walls["kmeans_k8_i2"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _consume(semdedup(emb, k=k_clusters, iters=2, threshold=0.35,
                      kernel=KERNEL))
    walls[f"semdedup_k{k_clusters}"] = round(time.perf_counter() - t0, 3)

    # The hierarchical bounding device at the same leaf count - the
    # operating rule past k ~ 1e3 (SCALE.md flat-vs-two-level note).
    side = max(2, int(round(k_clusters ** 0.5)))
    t0 = time.perf_counter()
    _consume(semdedup_twolevel(emb, k1=side, k2=side, iters1=2, iters2=2,
                               threshold=0.35, kernel=KERNEL))
    walls[f"semdedup2_{side}x{side}"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _consume(assemble_training_shards(docs, benchmark=None, budget=2048,
                                      num_partitions=8))
    walls["training_mix"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _consume(substring_spans(docs))
    walls["substring_spans"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _consume(ann_multitable_topk(emb))
    walls["ann_topk"] = round(time.perf_counter() - t0, 3)
    return walls


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # Driver memory must be set BEFORE the local JVM launches (this
    # script always starts a fresh process): the 30x SemDeDup pair
    # stage shuffles ~7M (vec, vec) array pairs, beyond the 1g local
    # default.
    spark = get_spark("scale-curve",
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  "spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = synthesize(spark, n)
    # Warm the JVM/codegen path once so 1x doesn't absorb cold cost.
    kmeans_assign(load_table(spark, BASE_SF, "embeddings"),
                  k=2, iters=1).count()

    base = run_flagships(spark, BASE_SF, k_clusters=8)
    big = run_flagships(spark, big_dir, k_clusters=8 * n)

    def _pair(key_base, key_big):
        ratio = round(big[key_big] / base[key_base], 2)
        return {"base_sec": base[key_base], "big_sec": big[key_big],
                "wall_ratio": ratio, "per_unit": round(ratio / n, 2)}

    result = {
        "scale_factor": n,
        "kernel": KERNEL,
        "base_dir": BASE_SF,
        "big_dir": big_dir,
        "kmeans": _pair("kmeans_k8_i2", "kmeans_k8_i2"),
        "semdedup": _pair("semdedup_k8", f"semdedup_k{8 * n}"),
        "semdedup_twolevel": _pair(
            "semdedup2_3x3",
            f"semdedup2_{max(2, int(round((8 * n) ** 0.5)))}x"
            f"{max(2, int(round((8 * n) ** 0.5)))}"),
        "training_mix": _pair("training_mix", "training_mix"),
        "substring_spans": _pair("substring_spans", "substring_spans"),
        "ann_topk": _pair("ann_topk", "ann_topk"),
    }
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
