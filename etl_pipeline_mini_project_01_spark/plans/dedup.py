"""Deduplication operator family over `documents` - the training-data
pipeline ops the engine adds beyond the reference (north star): exact
hash dedup, MinHash+LSH, SimHash, n-gram Jaccard.

Cross-engine determinism trick: every hash is md5 (identical hex output in
Spark and DuckDB), so MinHash signatures are min-of-md5-strings
(lexicographic min == deterministic uniform min) and SimHash uses the
first 8 hex chars as a 32-bit integer. No engine-specific hash functions.

Scale design (100 TB):
  * exact dedup: one shuffle on the content hash; at scale, hash is
    computed in the scan and the groupBy is partial-aggregated map-side;
  * MinHash: docs x shingles x K rows never materialize wide - signatures
    reduce per (doc, seed) immediately; the LSH band join is an equi-join
    on (band, bucket), i.e. shuffle-partitionable, never a cross join;
  * pair generation happens only within LSH buckets (candidate pruning),
    the defining property that keeps near-dup at 100 TB sub-quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import word_array
from .registry import register

MINHASH_K = 8          # hash functions
LSH_ROWS_PER_BAND = 2  # -> 4 bands
MERSENNE_P = 2147483647  # 2^31-1: universal-hash modulus

#: Fixed affine coefficients for the K universal hash functions
#: h_i(x) = (a_i * md5_32(x) + b_i) mod p - one md5 per shingle total,
#: K cheap arithmetic variants instead of K md5 passes (8x fewer hashes).
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1103, 12345), (2053, 54321), (4099, 31337), (8209, 271828),
    (16411, 141421), (32771, 577215), (65537, 662607), (131101, 299792),
)


def _tokens(df: DataFrame) -> DataFrame:
    return df.withColumn("w", word_array("text"))


@register(
    "dedup_exact",
    oracle="""
SELECT md5(LOWER(TRIM(text))) AS content_hash,
       COUNT(*) AS copies,
       MIN(doc_id) AS keeper_doc_id
FROM documents
GROUP BY 1
ORDER BY keeper_doc_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on normalized content: one row per
    distinct content, keeper = lowest doc_id (deterministic keep-first,
    the A7 semantics made reproducible)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.trim("text"))).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("copies"),
             F.min("doc_id").alias("keeper_doc_id"))
        .orderBy("keeper_doc_id")
    )


_COEFFS_SQL = "(VALUES " + ", ".join(
    f"({i}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
    for i, (a, b) in enumerate(MINHASH_COEFFS)) + ") AS hf(seed, a, b)"

_MINHASH_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(LOWER(text), '\\s+'), x -> x <> '') AS w
    FROM documents
),
shingles AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
    FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
hashed AS (
    SELECT doc_id,
           list_reduce(list_transform(string_split(substr(md5(shingle), 1, 8), ''),
               c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
               (x, y) -> x * 16 + y) AS h
    FROM shingles
),
sigs AS (
    SELECT doc_id, hf.seed, MIN((hf.a * h + hf.b) % {MERSENNE_P}) AS sig
    FROM hashed, {_COEFFS_SQL}
    GROUP BY doc_id, hf.seed
),
buckets AS (
    SELECT doc_id, seed // {LSH_ROWS_PER_BAND} AS band,
           string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS bucket
    FROM sigs GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM buckets a
JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates: word-3-gram shingles -> one
    md5_32 per shingle -> K universal-hash variants (a*h+b mod 2^31-1,
    fixed coefficients) -> per-(doc,seed) minima -> banded signatures ->
    equi-join on (band, bucket) -> distinct candidate pairs.
    Sub-quadratic: pairs only form inside identical LSH buckets; one
    cryptographic hash per shingle total."""
    docs = _tokens(load_table(spark, sf_dir, "documents"))
    shingles = (
        docs.select(
            "doc_id",
            F.explode(F.transform(
                F.sequence(F.lit(0), F.size("w") - 3),
                lambda i: F.concat_ws(
                    " ", F.col("w")[i], F.col("w")[i + 1], F.col("w")[i + 2]),
            )).alias("shingle"))
        .distinct()
    )
    coeffs = F.array(*[
        F.struct(F.lit(i).alias("seed"),
                 F.lit(a).cast("bigint").alias("a"),
                 F.lit(b).cast("bigint").alias("b"))
        for i, (a, b) in enumerate(MINHASH_COEFFS)])
    hashed = shingles.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
        .alias("h"))
    sigs = (
        hashed
        .select("doc_id", "h", F.explode(coeffs).alias("hf"))
        .groupBy("doc_id", F.col("hf.seed").alias("seed"))
        .agg(F.min((F.col("hf.a") * F.col("h") + F.col("hf.b")) % MERSENNE_P)
             .alias("sig"))
    )
    buckets = (
        sigs.withColumn("band", F.expr(f"seed div {LSH_ROWS_PER_BAND}"))
        .groupBy("doc_id", "band")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("seed", "sig"))),
                        lambda x: x["sig"].cast("string")), "|").alias("bucket"))
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


_SIMHASH_ORACLE = """
WITH toks AS (
    SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(LOWER(text), '\\s+'),
                              x -> x <> '')) AS tok
    FROM documents
),
hashed AS (
    SELECT doc_id,
           list_reduce(
               list_transform(string_split(substr(md5(tok), 1, 8), ''),
                              c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
               (a, b) -> a * 16 + b) AS h
    FROM toks
),
bit_sums AS (
    SELECT doc_id, bit,
           SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
    FROM hashed, UNNEST(range(0, 32)) AS b(bit)
    GROUP BY doc_id, bit
)
SELECT doc_id,
       SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS simhash
FROM bit_sums
GROUP BY doc_id
ORDER BY doc_id
"""


@register("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprint: 32-bit hash per distinct token (md5
    first-8-hex), per-bit +/-1 vote across tokens, sign -> bit. Near-dups
    then cluster by hamming distance on the fingerprint (see
    test_operators for the pairing); the fingerprint itself is the
    oracle-checked output."""
    docs = _tokens(load_table(spark, sf_dir, "documents"))
    toks = (docs.select("doc_id", F.explode("w").alias("tok")).distinct())
    hashed = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint").alias("h"))
    bits = hashed.select(
        "doc_id", "h",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit"))
    bit_sums = (
        bits.groupBy("doc_id", "bit")
        .agg(F.sum(F.when(F.expr("(h >> bit) & 1 = 1"), 1).otherwise(-1))
             .alias("s")))
    return (
        bit_sums.groupBy("doc_id")
        .agg(F.sum(F.when(F.col("s") > 0,
                          F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
                   .otherwise(F.lit(0))).alias("simhash"))
        .orderBy("doc_id")
    )


_JACCARD_ORACLE = """
WITH toksets AS (
    SELECT doc_id, source, lang,
           list_distinct(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                     x -> x <> '')) AS ts
    FROM documents
),
pairs AS (
    SELECT a.source, a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
             / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
               AS jaccard
    FROM toksets a
    JOIN toksets b ON a.source = b.source AND a.lang = b.lang
                  AND a.doc_id < b.doc_id
)
SELECT source, lang,
       COUNT(*) AS n_pairs,
       SUM(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS near_dup_pairs,
       CAST(SUM(CAST(jaccard AS DECIMAL(9,6))) AS DOUBLE) / COUNT(*)
           AS avg_jaccard
FROM pairs
GROUP BY source, lang
ORDER BY source, lang
"""


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup, blocked by (source, lang) - blocking is
    the scale story: pairwise comparison only inside blocks, an equi-join
    Spark shuffles by block key (vs the quadratic all-pairs cross join).
    Output is the per-block summary (pair counts, near-dup counts >= 0.5,
    decimal-exact mean similarity)."""
    docs = load_table(spark, sf_dir, "documents")
    toksets = docs.select(
        "doc_id", "source", "lang",
        F.array_distinct(word_array("text")).alias("ts"))
    a, b = toksets.alias("a"), toksets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ts"), F.col("b.ts")))
    union_sz = F.size(F.col("a.ts")) + F.size(F.col("b.ts")) - inter
    pairs = (
        a.join(b, (F.col("a.source") == F.col("b.source"))
               & (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.source").alias("source"), F.col("a.lang").alias("lang"),
                (inter.cast("double") / union_sz).alias("jaccard"))
    )
    return (
        pairs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.sum(F.when(F.col("jaccard") >= 0.5, 1).otherwise(0))
             .alias("near_dup_pairs"),
             (F.sum(F.col("jaccard").cast("decimal(9,6)")).cast("double")
              / F.count(F.lit(1))).alias("avg_jaccard"))
        .orderBy("source", "lang")
    )
