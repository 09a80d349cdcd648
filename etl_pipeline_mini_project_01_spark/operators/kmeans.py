"""Distributed k-means over an embedding column (Lloyd's algorithm with
broadcast centroids) - the clustering primitive behind SemDeDup-style
semantic dedup, domain discovery, and diversity-balanced sampling in
LLM data pipelines.

Scale shape (MLlib's own): centroids are control-plane (k x dim doubles,
driver-resident between iterations); each iteration is one map-side
assignment pass (every row scores k literal centroids - no join, no
shuffle of the data) plus ONE partial-aggregated shuffle of k x dim sum
rows. At 100 TB the per-iteration network cost is k x dim values, not
the corpus.

Cross-engine determinism (what makes a DuckDB oracle possible, unlike
float-mean k-means which diverges at the ulp level under reordered
partial sums):
  * components are integer-scaled up front: xi = floor(x * 2^20) -
    float->double cast, multiply by a power of two, and floor are all
    EXACT, so xi is engine-identical;
  * per-cluster component sums are BIGINT - exact and order-insensitive
    (the reduction order a shuffle cannot pin down never touches a
    float);
  * centroid components mu = s / (n * 2^20) are ONE correctly-rounded
    IEEE division of exactly-representable integers - bit-identical in
    Python, Spark, and DuckDB;
  * distances fold over dims in fixed index order from a 0.0 accumulator
    (F.aggregate here, list_reduce(list_prepend(0.0, ...)) in the
    oracle): same operation sequence, same roundings, bit-identical
    doubles; argmin ties break on the lowest centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^20: multiplying a double by it only shifts the exponent (exact), and
#: component sums stay far inside BIGINT for corpora up to ~2^43 rows.
SCALE = 1 << 20


def _scaled(emb: DataFrame, vec_col: str) -> DataFrame:
    """Adds xi (bigint-scaled components) and xd (their exact double
    form, xi / 2^20 - a power-of-two division, no rounding)."""
    return (emb
            .withColumn("xi", F.transform(
                vec_col,
                lambda v: F.floor(v.cast("double") * SCALE).cast("bigint")))
            .withColumn("xd", F.transform(
                "xi", lambda v: v.cast("double") / SCALE)))


def _dist(cent: list[float], dim: int):
    """Squared euclidean distance of xd to a literal centroid, folded in
    dim order from 0.0. xd is a materialized COLUMN (not a rebuilt
    expression), so element access inside the lambda is O(1)."""
    arr = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)), F.lit(0.0),
        lambda a, i: a + (F.element_at("xd", i) - F.element_at(arr, i))
                       * (F.element_at("xd", i) - F.element_at(arr, i)))


def _assign(df: DataFrame, cents: list[list[float]], dim: int) -> DataFrame:
    """Adds `cluster` (argmin centroid, ties -> lowest id) and
    `centroid_dist` (the winning squared distance) to a _scaled frame."""
    dists = F.array(*[_dist(c, dim) for c in cents])
    return (df.withColumn("_d", dists)
            .withColumn("cluster",
                        (F.array_position("_d", F.array_min("_d")) - 1)
                        .cast("bigint"))
            .withColumn("centroid_dist", F.array_min("_d"))
            .drop("_d"))


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> tuple[list[list[float]], int]:
    """Run `iters` Lloyd's updates and return (centroids, dim) - the
    driver-resident model. Deterministic: init centroids are the rows
    with id_col 0..k-1 (they must exist), the iteration count is fixed
    (no data-dependent convergence branch), and every arithmetic step is
    engine-exact per the module docstring. Empty clusters keep their
    previous centroid."""
    x = _scaled(emb.select(id_col, vec_col), vec_col)

    init = (x.filter(F.col(id_col) < k)
            .select(id_col, "xd").orderBy(id_col).collect())
    if len(init) != k:
        raise ValueError(f"init needs {id_col} 0..{k - 1} present")
    cents = [list(r["xd"]) for r in init]
    dim = len(cents[0])

    for _ in range(iters):
        sums = (_assign(x, cents, dim).groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("xi", i + 1)).alias(f"s{i}")
              for i in range(dim)]))
        by_cluster = {int(r["cluster"]): r for r in sums.collect()}
        cents = [
            [int(r[f"s{i}"]) / (int(r["n"]) * SCALE) for i in range(dim)]
            if (r := by_cluster.get(j)) is not None else cents[j]
            for j in range(k)
        ]
    return cents, dim


def kmeans_transform(emb: DataFrame, cents: list[list[float]], dim: int,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(id_col, cluster, centroid_dist) for a fitted model: one map-side
    pass, no shuffle. Because `cents` are plain literals, every call
    builds an INDEPENDENT plan - so two transforms of the same input can
    be self-joined without tripping Spark's lambda-variable rebinding on
    deduplicated higher-order-function subplans."""
    x = _scaled(emb.select(id_col, vec_col), vec_col)
    return _assign(x, cents, dim).select(id_col, "cluster", "centroid_dist")


def kmeans_assign(emb: DataFrame, k: int = 8, iters: int = 2,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id_col, cluster, cluster_size): fit + final assignment."""
    cents, dim = kmeans_fit(emb, k, iters, id_col, vec_col)
    w = Window.partitionBy("cluster")
    return (kmeans_transform(emb, cents, dim, id_col, vec_col)
            .select(id_col, "cluster",
                    F.count(F.lit(1)).over(w).alias("cluster_size"))
            )
