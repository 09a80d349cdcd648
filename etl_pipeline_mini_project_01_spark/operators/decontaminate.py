"""Benchmark decontamination: flag/remove training documents that
contain verbatim n-gram overlap with an evaluation benchmark - standard
pre-training hygiene (the GPT-3/Gopher-style 13-gram collision rule)
so that held-out benchmarks stay held out.

Scale shape (100 TB corpus vs MB-scale benchmark):
  * both sides reduce to DISTINCT hashed word n-grams (xxhash64 - a
    64-bit JVM hash, no string shuffle: collisions at benchmark scale
    ~1e-9, and a collision only costs one extra flagged doc);
  * the overlap is an equi-join on the hash. The benchmark side is
    usually broadcast-sized, but no broadcast is FORCED - AQE picks
    broadcast when the runtime size allows, shuffled hash join
    otherwise (a 100 TB-safe default, same policy as plans/dedup.py);
  * per-doc counts aggregate map-side; removal is a broadcast-able
    anti/semi join back against the corpus.

Docs with fewer than n tokens produce zero n-grams and are never
flagged (vacuously clean), mirroring the short-doc shingle guard in
plans/dedup.py:156-162.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_array

#: GPT-3 appendix C / Gopher use 13-gram collisions; 8-13 is the common
#: range. Tunable per call.
DEFAULT_N = 13


def _ngram_hashes(df: DataFrame, n: int, id_col: str,
                  text_col: str) -> DataFrame:
    """(id_col, gram_hash): distinct xxhash64 of each word n-gram."""
    toks = df.select(id_col, word_array(text_col).alias("_w"))
    idx = F.when(F.size("_w") >= n,
                 F.sequence(F.lit(1), F.size("_w") - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    return (toks.select(
        id_col,
        F.explode(F.transform(
            idx, lambda i: F.xxhash64(F.array_join(F.slice("_w", i, n), " "))
        )).alias("gram_hash"))
        .distinct())


def contamination_scores(docs: DataFrame, benchmark: DataFrame,
                         n: int = DEFAULT_N, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Per-document contamination report against `benchmark` (any relation
    with `text_col`): (id_col, doc_ngrams, hit_ngrams, contamination)
    where contamination = hit_ngrams / doc_ngrams (0.0 for docs with no
    n-grams). One row per input document, including clean ones."""
    grams = _ngram_hashes(docs, n, id_col, text_col)
    bench = (_ngram_hashes(
        benchmark.select(F.monotonically_increasing_id().alias("_bid"),
                         F.col(text_col)), n, "_bid", text_col)
        .select("gram_hash").distinct())
    per_doc = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("doc_ngrams"))
    hits = (grams.join(bench, "gram_hash")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("hit_ngrams")))
    return (docs.select(id_col)
            .join(per_doc, id_col, "left")
            .join(hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("doc_ngrams", F.lit(0)).alias("doc_ngrams"),
                F.coalesce("hit_ngrams", F.lit(0)).alias("hit_ngrams"))
            .withColumn(
                "contamination",
                F.when(F.col("doc_ngrams") > 0,
                       F.col("hit_ngrams") / F.col("doc_ngrams"))
                .otherwise(F.lit(0.0)).cast("double")))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = DEFAULT_N, max_hits: int = 0,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Docs with at most `max_hits` overlapping n-grams (default: zero
    tolerance), all original columns preserved. Left-semi against the
    clean id set so the corpus relation itself is never widened."""
    clean = (contamination_scores(docs, benchmark, n, id_col, text_col)
             .filter(F.col("hit_ngrams") <= max_hits)
             .select(id_col))
    return docs.join(clean, id_col, "left_semi")
