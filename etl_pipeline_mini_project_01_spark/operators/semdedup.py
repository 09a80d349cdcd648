"""SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
deduplication of an embedding corpus - k-means-cluster the embeddings,
then inside each cluster drop every member that has a near-duplicate
neighbor (cosine >= threshold) closer to the centroid than itself, so
each semantic-duplicate neighborhood keeps its single most "peripheral"
example (the paper's keep-lowest-centroid-similarity rule: peripheral
examples carry more signal than the cluster-mode ones).

Scale shape: the quadratic pairwise stage is BOUNDED BY THE CLUSTER -
that is the entire point of the k-means stage (choose k so clusters are
~1e5 rows and the within-cluster join is tractable at 100 TB); the join
is an equi-join on cluster id with scalar-only conditions, and the
centroids are a driver-resident literal model (operators/kmeans.py).

Two materialization decisions matter for the join cost (measured 3x+ at
sf0.1):
  * the (id, cluster, centroid_dist) assignment is localCheckpoint-ed
    before self-joining - otherwise the join re-evaluates the k x dim
    argmin expression per PROBE row (at 100 TB this relation is three
    scalar columns you would persist to storage anyway, since both join
    sides and the final verdict read it);
  * vectors are L2-NORMALIZED once per row up front, so the per-pair
    cosine is a single dot-product fold instead of dot + two norms
    (higher-order-function folds are interpreted, not codegen'd - per-
    pair cost is the bottleneck), and they are attached to the pair
    relation by id equi-joins AFTER the cheap dominance join prunes it.

Determinism: the kept-set depends only on (cluster assignment, pairwise
normalized dots, centroid distances, ids) - all bit-identical
cross-engine: the kmeans module's integer-exact arithmetic; one
correctly-rounded IEEE division per normalized component; fixed-order
fold for the dot. Dominance is the strict total order
(centroid_dist DESC, id ASC), so ties cannot flap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import kmeans_fit, kmeans_transform


def normalized_vectors(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """(id_col, nv): L2-normalized float64 vectors. The squared norm is
    projected into a column FIRST so the per-element division does not
    re-run the fold per element (the HOF-lambda CSE pitfall)."""
    return (emb
            .withColumn("_n2", F.aggregate(
                vec_col, F.lit(0.0),
                lambda a, v: a + v.cast("double") * v.cast("double")))
            .select(id_col,
                    F.transform(vec_col,
                                lambda x: x.cast("double") / F.sqrt("_n2"))
                    .alias("nv")))


def semdedup(emb: DataFrame, k: int = 8, iters: int = 2,
             threshold: float = 0.35, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """(id_col, cluster, kept): kept=False for every member dominated by
    a same-cluster neighbor with cosine >= threshold that sits farther
    from the centroid (ties: lower id dominates). Keep-filtering is
    `WHERE kept` downstream; emitting the verdict per row keeps the
    relation auditable."""
    cents, dim = kmeans_fit(emb, k, iters, id_col, vec_col)
    # Three scalar columns; both join sides + the verdict read it.
    assigned = kmeans_transform(emb, cents, dim, id_col, vec_col) \
        .localCheckpoint()
    nv = normalized_vectors(emb, id_col, vec_col).localCheckpoint()

    a, b = assigned.alias("a"), assigned.alias("b")
    dominance = (
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        & ((F.col("b.centroid_dist") > F.col("a.centroid_dist"))
           | ((F.col("b.centroid_dist") == F.col("a.centroid_dist"))
              & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")))))
    nva = nv.select(F.col(id_col).alias("_ida"), F.col("nv").alias("nva"))
    nvb = nv.select(F.col(id_col).alias("_idb"), F.col("nv").alias("nvb"))
    dot = F.aggregate(F.zip_with("nva", "nvb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    dominated = (
        a.join(b, dominance)
        .join(nva, F.col(f"a.{id_col}") == F.col("_ida"))
        .join(nvb, F.col(f"b.{id_col}") == F.col("_idb"))
        .repartition(F.col(f"a.{id_col}"))
        .filter(dot >= threshold)
        .select(F.col(f"a.{id_col}").alias("_dropped_id"))
        .distinct())

    return (assigned
            .join(dominated,
                  F.col(id_col) == F.col("_dropped_id"), "left")
            .select(id_col, "cluster",
                    F.col("_dropped_id").isNull().alias("kept")))
