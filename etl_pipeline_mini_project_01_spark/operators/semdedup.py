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
is an equi-join on cluster id, shuffle-partitioned by cluster, with the
centroids a driver-resident literal model (operators/kmeans.py). Both
join sides are INDEPENDENT kmeans_transform plans from the same fitted
centroids - deliberately not a self-joined single plan, which trips
Spark's lambda-variable rebinding on deduplicated higher-order-function
subplans (see kmeans_transform's docstring).

Determinism: the kept-set depends only on (cluster assignment, pairwise
cosines, centroid distances, ids) - all bit-identical cross-engine (the
kmeans module's integer-exact arithmetic; cosine as a fixed-order fold
of correctly-rounded IEEE ops). Dominance is the strict total order
(centroid_dist DESC, id ASC), so ties cannot flap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kmeans import kmeans_fit, kmeans_transform


def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    n2 = lambda v: F.aggregate(  # noqa: E731
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    return dot / (F.sqrt(n2(a)) * F.sqrt(n2(b)))


def semdedup(emb: DataFrame, k: int = 8, iters: int = 2,
             threshold: float = 0.35, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """(id_col, cluster, kept): kept=False for every member dominated by
    a same-cluster neighbor with cosine >= threshold that sits farther
    from the centroid (ties: lower id dominates). Keep-filtering is
    `WHERE kept` downstream; emitting the verdict per row keeps the
    relation auditable."""
    cents, dim = kmeans_fit(emb, k, iters, id_col, vec_col)

    def side(name: str) -> DataFrame:
        return (kmeans_transform(emb, cents, dim, id_col, vec_col)
                .join(emb.select(id_col, vec_col), id_col)
                .alias(name))

    a, b = side("a"), side("b")
    dominated = (
        a.join(
            b,
            (F.col(f"a.cluster") == F.col(f"b.cluster"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            & ((F.col("b.centroid_dist") > F.col("a.centroid_dist"))
               | ((F.col("b.centroid_dist") == F.col("a.centroid_dist"))
                  & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))))
            & (_cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
               >= threshold))
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct())

    out = side("o")
    return (out.join(dominated.withColumnRenamed(id_col, "_dropped_id"),
                     F.col(f"o.{id_col}") == F.col("_dropped_id"), "left")
            .select(F.col(f"o.{id_col}").alias(id_col),
                    "cluster",
                    F.col("_dropped_id").isNull().alias("kept")))
