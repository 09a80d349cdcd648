"""Phase-level profiling of the heaviest headline rows (guide SS1:
measure first). Each phase is timed with a noop-sink consume (or the
action the row itself performs), labelled via setJobDescription.

Usage: python tools/r14_profile.py <row> [row ...]
Rows: pq, vsink, mix, ivfpq, kmeans, ivflayout, hier, ivfkmeans, genswap
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_mini_project_01_spark.catalog import load_table  # noqa: E402
from etl_pipeline_mini_project_01_spark.plans import registry  # noqa: E402
from etl_pipeline_mini_project_01_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


class T:
    def __init__(self, spark):
        self.spark = spark
        self.t0 = time.perf_counter()
        self.last = self.t0

    def lap(self, label):
        now = time.perf_counter()
        print(f"  {label:45s} {now - self.last:7.2f}s")
        self.last = now

    def total(self):
        print(f"  {'TOTAL':45s} {time.perf_counter() - self.t0:7.2f}s")


def profile_pq(spark):
    from etl_pipeline_mini_project_01_spark.operators.pq import (
        pq_adc_topk, pq_encode, pq_train)
    from etl_pipeline_mini_project_01_spark.plans.similarity import (
        _ANN_TOP_K, _PQ_ITERS, _PQ_KSUB, _PQ_M, N_QUERIES)

    t = T(spark)
    emb = load_table(spark, SF, "embeddings")
    books = pq_train(emb, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS)
    t.lap("pq_train")
    codes = pq_encode(emb, books).localCheckpoint()
    t.lap("pq_encode + localCheckpoint")
    queries = (emb.filter(F.col("vec_id") < N_QUERIES)
               .select("vec_id", "embedding"))
    n = emb.count()
    t.lap("emb.count()")
    topk = pq_adc_topk(codes, queries, books, k=_ANN_TOP_K,
                       rerank=n, emb=emb)
    t.lap("pq_adc_topk build (collect queries+luts)")
    noop(topk)
    t.lap("topk execute (ADC + window + rerank)")
    code_rows = (codes
                 .select(F.col("vec_id").alias("id1"),
                         F.posexplode("codes").alias("id2", "ival"))
                 .select(F.lit("code").alias("row_kind"), "id1",
                         F.col("id2").cast("bigint").alias("id2"),
                         F.col("ival").cast("bigint").alias("ival"),
                         F.lit(None).cast("double").alias("dval")))
    topk_rows = topk.select(
        F.lit("topk").alias("row_kind"),
        F.col("query_id").alias("id1"),
        F.col("vec_id").alias("id2"),
        F.col("rank").cast("bigint").alias("ival"),
        F.col("score").alias("dval"))
    out = code_rows.unionByName(topk_rows).orderBy("row_kind", "id1", "id2")
    noop(out)
    t.lap("full union re-execute (row as benched)")
    t.total()


def profile_vsink(spark):
    # run the registered row but with section timers patched in via the
    # module-level functions it calls
    t = T(spark)
    df = registry.QUERIES["versioned_stream_sink"](spark, SF)
    t.lap("build (stage + stream + verify counts)")
    noop(df)
    t.lap("final noop")
    t.total()


def profile_mix(spark):
    from etl_pipeline_mini_project_01_spark.operators.mix import (
        assemble_training_shards)
    from etl_pipeline_mini_project_01_spark.plans.curation import (
        _near_dup_edges, connected_components)
    from etl_pipeline_mini_project_01_spark.plans.mix import _MIX_BUDGET

    t = T(spark)
    docs = load_table(spark, SF, "documents")
    edges = _near_dup_edges(docs)
    noop(edges)
    t.lap("near_dup_edges")
    cc = connected_components(edges)
    noop(cc)
    t.lap("connected_components (rounds)")
    out = assemble_training_shards(docs, benchmark=None, budget=_MIX_BUDGET,
                                   num_partitions=8).orderBy("doc_id")
    t.lap("assemble build")
    noop(out)
    t.lap("assemble execute")
    t.total()


def profile_kmeans(spark):
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit, kmeans_fit_twolevel)
    from etl_pipeline_mini_project_01_spark.plans.similarity import (
        _KM2_ITERS1, _KM2_ITERS2, _KM2_K1, _KM2_K2)

    t = T(spark)
    emb = load_table(spark, SF, "embeddings")
    cents, dim = kmeans_fit(emb, k=8, iters=2)
    t.lap("kmeans_fit k=8 iters=2")
    df = registry.QUERIES["kmeans_embedding_clusters"](spark, SF)
    t.lap("kmeans_embedding_clusters build")
    noop(df)
    t.lap("kmeans_embedding_clusters execute")
    cc, fi, dim = kmeans_fit_twolevel(emb, k1=_KM2_K1, k2=_KM2_K2,
                                      iters1=_KM2_ITERS1, iters2=_KM2_ITERS2)
    t.lap("kmeans_fit_twolevel")
    df = registry.QUERIES["kmeans_twolevel_clusters"](spark, SF)
    t.lap("twolevel row build")
    noop(df)
    t.lap("twolevel row execute")
    t.total()


def profile_ivfpq(spark):
    from etl_pipeline_mini_project_01_spark.operators.kmeans import (
        kmeans_fit_twolevel)
    from etl_pipeline_mini_project_01_spark.operators.pq import (
        ivf_pq_probe_twolevel, pq_train, write_ivf_pq_layout_twolevel)
    from etl_pipeline_mini_project_01_spark.plans import similarity as S

    t = T(spark)
    emb = load_table(spark, SF, "embeddings")
    cc, fi, dim = kmeans_fit_twolevel(
        emb, k1=S._KM2_K1, k2=S._KM2_K2,
        iters1=S._KM2_ITERS1, iters2=S._KM2_ITERS2)
    t.lap("kmeans_fit_twolevel")
    books = pq_train(emb, m=S._PQ_M, ksub=S._PQ_KSUB, iters=S._PQ_ITERS)
    t.lap("pq_train")
    path = "/tmp/r14prof_ivfpq"
    import shutil
    shutil.rmtree(path, ignore_errors=True)
    write_ivf_pq_layout_twolevel(emb, cc, fi, S._KM2_K2, dim, books, path)
    t.lap("write_ivf_pq_layout_twolevel")
    queries = (emb.filter(F.col("vec_id") < S.N_QUERIES)
               .select("vec_id", "embedding"))
    n = emb.count()
    t.lap("emb.count")
    topk = ivf_pq_probe_twolevel(
        spark, path, queries, cc, fi, S._KM2_K2, books,
        nprobe=S._HIER_NPROBE, k=S._ANN_TOP_K, nprobe_coarse=S._HIER_NPC,
        rerank=n, emb=emb, probe_lists="literal")
    t.lap("probe build")
    noop(topk)
    t.lap("probe execute")
    df = registry.QUERIES["ann_ivfpq_stored_probe"](spark, SF)
    t.lap("full row build")
    noop(df)
    t.lap("full row execute")
    t.total()


def profile_row(spark, name):
    t = T(spark)
    df = registry.QUERIES[name](spark, SF)
    t.lap(f"{name} build")
    noop(df)
    t.lap(f"{name} execute")
    t.total()


PROFILES = {
    "pq": profile_pq,
    "vsink": profile_vsink,
    "mix": profile_mix,
    "kmeans": profile_kmeans,
    "ivfpq": profile_ivfpq,
}


def main():
    spark = get_spark("r14-profile", master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all_plans()
    # warm codegen/python-worker path once
    registry.QUERIES["g6_daily_event_trends"](spark, SF).limit(1).collect()
    for arg in sys.argv[1:]:
        print(f"== {arg} ==")
        if arg in PROFILES:
            PROFILES[arg](spark)
        else:
            profile_row(spark, arg)
    spark.stop()


if __name__ == "__main__":
    main()
