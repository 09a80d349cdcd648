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
  * pair generation happens only within LSH buckets (candidate pruning) -
    the defining property that keeps near-dup at 100 TB sub-quadratic.
    The Jaccard scorer consumes LSH candidates, never all-pairs blocks
    (a skewed (source, lang) block would be quadratic at scale);
  * (K, rows_per_band) are tunable: more bands -> higher recall, longer
    bands -> higher precision. `tests/test_dedup_quality.py` measures
    candidate precision/recall against exact-Jaccard ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import word_array
from .registry import register

MINHASH_K = 8          # hash functions (default; tunable via minhash_coeffs)
LSH_ROWS_PER_BAND = 2  # -> 4 bands at K=8
MERSENNE_P = 2147483647  # 2^31-1: universal-hash modulus

#: Fixed affine coefficients for the first 8 universal hash functions
#: h_i(x) = (a_i * md5_32(x) + b_i) mod p - one md5 per shingle total,
#: K cheap arithmetic variants instead of K md5 passes (Kx fewer hashes).
_BASE_COEFFS: tuple[tuple[int, int], ...] = (
    (1103, 12345), (2053, 54321), (4099, 31337), (8209, 271828),
    (16411, 141421), (32771, 577215), (65537, 662607), (131101, 299792),
)


def minhash_coeffs(k: int = MINHASH_K) -> tuple[tuple[int, int], ...]:
    """Deterministic (a_i, b_i) coefficients for K universal hashes.

    The first 8 come from the fixed table (stable across rounds); beyond 8
    they extend via modular powers - reproducible in any engine because
    the *values* (not the formula) are injected as literals on both the
    Spark and oracle sides.
    """
    extra = tuple(
        (pow(31, i + 1, MERSENNE_P - 2) + 1, pow(37, i + 1, MERSENNE_P))
        for i in range(len(_BASE_COEFFS), k))
    return (_BASE_COEFFS + extra)[:k]


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


# ---------------------------------------------------------------------------
# Shared MinHash/LSH machinery (Spark builders + DuckDB oracle CTE text),
# parameterized on (K, rows_per_band) and reused by dedup_minhash_lsh AND
# dedup_ngram_jaccard (candidate generation) AND the quality tests.
# ---------------------------------------------------------------------------

def _coeffs_sql(k: int) -> str:
    return "(VALUES " + ", ".join(
        f"({i}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
        for i, (a, b) in enumerate(minhash_coeffs(k))) + ") AS hf(seed, a, b)"


def lsh_buckets_sql(k: int = MINHASH_K,
                    rows_per_band: int = LSH_ROWS_PER_BAND) -> str:
    """DuckDB CTE chain `toks, shingles, hashed, sigs, buckets` mirroring
    :func:`lsh_buckets`. Caller wraps in ``WITH {..} SELECT ...``."""
    return f"""toks AS (
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
    FROM hashed, {_coeffs_sql(k)}
    GROUP BY doc_id, hf.seed
),
buckets AS (
    SELECT doc_id, seed // {rows_per_band} AS band,
           string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS bucket
    FROM sigs GROUP BY 1, 2
)"""


#: Skew guard: a (band, bucket) group larger than this is salt-split
#: into ceil(n / cap) sub-buckets before pairing. Far above any fixture
#: bucket (max observed: 8 at sf0.1), so it only ever fires on
#: degenerate content (boilerplate shingles) - the case that would
#: otherwise make one join group quadratic at 100 TB.
LSH_BUCKET_CAP = 64

#: Salted twin of :func:`lsh_candidates`'s guard. nsplits = 1+(n-1)//cap
#: (pure integer arithmetic in both engines); the salt is the md5-derived
#: 32-bit doc hash mod nsplits, so sub-bucket membership is deterministic
#: in doc_id alone and identical cross-engine.
_CANDIDATES_SQL = f"""bsalted AS (
    SELECT doc_id, band, bucket,
           list_reduce(list_transform(
               string_split(substr(md5('bsalt|' || CAST(doc_id AS VARCHAR)),
                                   1, 8), ''),
               c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
               (x, y) -> x * 16 + y)
           % (1 + (COUNT(*) OVER (PARTITION BY band, bucket) - 1)
              // {LSH_BUCKET_CAP}) AS salt
    FROM buckets
),
cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bsalted a
    JOIN bsalted b ON a.band = b.band AND a.bucket = b.bucket
                  AND a.salt = b.salt
                  AND a.doc_id < b.doc_id
)"""


def lsh_buckets(docs: DataFrame, k: int = MINHASH_K,
                rows_per_band: int = LSH_ROWS_PER_BAND,
                hash_fn: str = "md5_32") -> DataFrame:
    """(doc_id, band, bucket): word-3-gram shingles -> one base hash per
    shingle -> K universal-hash variants (a*h+b mod 2^31-1, fixed
    coefficients) -> per-(doc, seed) minima -> banded signatures.
    `docs` needs (doc_id, text).

    hash_fn: 'md5_32' (default) is engine-neutral - required for the
    DuckDB oracle twins; 'xxhash64' is the production fast path (pure
    JVM, no hex round-trip, ~10x cheaper per shingle) for 100 TB runs
    where cross-engine reproducibility is not needed. Candidate quality
    is hash-agnostic (tests/test_dedup_quality.py covers both)."""
    toks = _tokens(docs)
    # Docs with <3 tokens emit NO shingles (F.sequence(0, negative) would
    # produce a DESCENDING sequence whose out-of-range lookups collapse to
    # a shared '' shingle, pairing every short doc quadratically; the
    # DuckDB twin's range(1, len(w)-1) already emits nothing for them).
    idx = F.when(F.size("w") >= 3,
                 F.sequence(F.lit(0), F.size("w") - 3)
                 ).otherwise(F.array().cast("array<int>"))
    shingles = (
        toks.select(
            "doc_id",
            F.explode(F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.col("w")[i], F.col("w")[i + 1], F.col("w")[i + 2]),
            )).alias("shingle"))
        .distinct()
    )
    if hash_fn == "xxhash64":
        base = F.pmod(F.xxhash64("shingle"), F.lit(MERSENNE_P))
    elif hash_fn == "md5_32":
        base = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10)
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    hashed = shingles.select(
        "doc_id", base.cast("bigint").alias("h"))
    # K independent MIN aggregates in ONE groupBy(doc_id): the shuffle
    # carries only the shingle rows (with map-side partial mins), not the
    # K-times-exploded (doc, seed) relation a coeff-explode would push
    # through the exchange - same signatures, 1/K the shuffled rows.
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P).alias(f"_s{i}")
        for i, (a, b) in enumerate(minhash_coeffs(k))]
    sigs = hashed.groupBy("doc_id").agg(*mins)
    # Bands assemble from the K signature columns row-locally (no second
    # aggregation); seeds stay in ascending order inside each bucket string,
    # and a ragged final band (k % rows_per_band != 0) keeps its short tail.
    n_bands = -(-k // rows_per_band)
    bands = F.array(*[
        F.struct(
            F.lit(bd).cast("int").alias("band"),
            F.concat_ws("|", *[
                F.col(f"_s{i}").cast("string")
                for i in range(bd * rows_per_band,
                               min(k, (bd + 1) * rows_per_band))]).alias("bucket"))
        for bd in range(n_bands)])
    return (sigs.select("doc_id", F.explode(bands).alias("bb"))
            .select("doc_id", F.col("bb.band").alias("band"),
                    F.col("bb.bucket").alias("bucket")))


def lsh_candidates(buckets: DataFrame,
                   bucket_cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Distinct (doc_a, doc_b) candidate pairs: equi-join on (band,
    bucket) - pairs only form inside identical LSH buckets, the property
    that keeps near-dup sub-quadratic at 100 TB.

    Skew guard (the classic LSH blow-up: one boilerplate-shingle bucket
    holding a huge fraction of the corpus makes that join group
    quadratic): any (band, bucket) group larger than `bucket_cap` is
    salt-split into ceil(n / cap) sub-buckets keyed on a salted md5 of
    the doc_id, bounding every join group's pair count at ~n * cap
    instead of n^2. The split is a window count over (band, bucket) -
    one additional exchange of the (small: docs x bands rows) buckets
    relation before the join's own (band, bucket, salt) exchange; the
    salt must be part of the JOIN KEY, not a post-join filter, because
    a filtered equi-join still probes the full n^2 of a degenerate
    hash group even though it emits less. Recall
    tradeoff: pairs landing in different salt shards of an oversized
    bucket are lost in THAT band only - other bands (and for true
    near-dups, most bands) still catch them; fixture buckets never
    exceed the cap, so driver-checked outputs are unchanged
    (tests/test_dedup_quality.py pins the degenerate-corpus bound)."""
    from pyspark.sql import Window

    n = F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    nsplits = F.expr(f"1 + ((_n - 1) div {bucket_cap})")
    salt_hash = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("bsalt|"), F.col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("bigint")
    salted = (buckets.withColumn("_n", n)
              .withColumn("salt", F.pmod(salt_hash, nsplits))
              .drop("_n"))
    a, b = salted.alias("a"), salted.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.salt") == F.col("b.salt"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {lsh_buckets_sql()},
{_CANDIDATES_SQL}
SELECT doc_a, doc_b FROM cands
ORDER BY doc_a, doc_b
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates (see :func:`lsh_buckets` /
    :func:`lsh_candidates`). Sub-quadratic: pairs only form inside
    identical LSH buckets; one cryptographic hash per shingle total."""
    docs = load_table(spark, sf_dir, "documents")
    return (lsh_candidates(lsh_buckets(docs))
            .orderBy("doc_a", "doc_b"))


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
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
            AS BIGINT) AS simhash
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
    # 32 per-bit +/-1 vote SUMs in ONE groupBy(doc_id): the shuffle moves
    # the (doc, token-hash) rows with map-side partial sums, not the
    # 32-times-exploded (doc, bit) relation; the sign->bit assembly is
    # then row-local arithmetic. Same fingerprints, 1/32 the shuffled rows.
    votes = [
        F.sum(F.when(F.expr(f"(h >> {bit}) & 1 = 1"), 1).otherwise(-1))
        .alias(f"_v{bit}") for bit in range(32)]
    bit_sums = hashed.groupBy("doc_id").agg(*votes)
    fingerprint = None
    for bit in range(32):
        term = F.when(F.col(f"_v{bit}") > 0,
                      F.lit(1 << bit).cast("bigint")).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return (bit_sums.select("doc_id", fingerprint.alias("simhash"))
            .orderBy("doc_id"))


_JACCARD_ORACLE = f"""
WITH {lsh_buckets_sql()},
{_CANDIDATES_SQL},
toksets AS (
    SELECT doc_id,
           list_distinct(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                     x -> x <> '')) AS ts
    FROM documents
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
         / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
           AS jaccard,
       len(list_intersect(a.ts, b.ts)) >=
         (0.5 * (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))))
           AS is_near_dup
FROM cands c
JOIN toksets a ON c.doc_a = a.doc_id
JOIN toksets b ON c.doc_b = b.doc_id
ORDER BY doc_a, doc_b
"""


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard scoring over LSH candidate pairs - blocking by
    MinHash/LSH bucket (reusing :func:`lsh_candidates`), NOT by
    (source, lang) all-pairs: a skewed attribute block (e.g. all "en"/
    "web" docs) is O(B^2) at 100 TB, while LSH candidates stay
    sub-quadratic regardless of attribute skew. The candidate relation
    carries NO broadcast hint: it grows with corpus size x duplication
    rate, so a forced broadcast could exceed the 8 GB cap at 100 TB -
    AQE picks broadcast when the runtime size allows and falls back to a
    shuffled hash join on doc_a/doc_b otherwise (the scale-safe default).
    Output: per-candidate exact Jaccard + the >= 0.5 near-dup verdict
    (LSH recall is measured separately in tests/test_dedup_quality.py)."""
    docs = load_table(spark, sf_dir, "documents")
    cands = lsh_candidates(lsh_buckets(docs))
    toksets = docs.select(
        "doc_id", F.array_distinct(word_array("text")).alias("ts"))
    ts_a = toksets.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    ts_b = toksets.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    union_sz = F.size("ts_a") + F.size("ts_b") - inter
    return (
        cands
        .join(ts_a, "doc_a")
        .join(ts_b, "doc_b")
        .select(
            "doc_a", "doc_b",
            (inter.cast("double") / union_sz).alias("jaccard"),
            (inter >= 0.5 * union_sz).alias("is_near_dup"),
        )
        .orderBy("doc_a", "doc_b")
    )


_EDITDIST_ORACLE = f"""
WITH {lsh_buckets_sql()},
{_CANDIDATES_SQL},
texts AS (SELECT doc_id, substr(LOWER(TRIM(text)), 1, 120) AS t
          FROM documents)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_distance,
       CAST(1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
            / GREATEST(len(a.t), len(b.t)) AS DOUBLE) AS similarity
FROM cands c
JOIN texts a ON c.doc_a = a.doc_id
JOIN texts b ON c.doc_b = b.doc_id
ORDER BY doc_a, doc_b
"""


@register("dedup_editdistance_pairs", oracle=_EDITDIST_ORACLE)
def dedup_editdistance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup scoring (fuzzy titles/names, the other
    classic training-data dedup axis beside token Jaccard): Levenshtein
    over LSH candidate pairs only - O(len^2) per comparison is affordable
    precisely because the LSH blocking keeps the pair count sub-quadratic;
    a 120-char prefix bounds the DP cost. Same unhinted candidate-join
    shape as dedup_ngram_jaccard (AQE decides broadcast vs shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    cands = lsh_candidates(lsh_buckets(docs))
    texts = docs.select(
        "doc_id",
        F.substring(F.lower(F.trim("text")), 1, 120).alias("t"))
    t_a = texts.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("t_a"))
    t_b = texts.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("t_b"))
    dist = F.levenshtein("t_a", "t_b")
    return (
        cands
        .join(t_a, "doc_a")
        .join(t_b, "doc_b")
        .select(
            "doc_a", "doc_b",
            dist.cast("bigint").alias("edit_distance"),
            (F.lit(1.0) - dist.cast("double")
             / F.greatest(F.length("t_a"), F.length("t_b")))
            .cast("double").alias("similarity"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better", arXiv:2107.06499): the remaining dedup
# axis beside whole-doc exact, MinHash near-dup, SimHash, and semantic -
# memorization risk comes from long VERBATIM SPANS shared across
# otherwise-distinct documents (licenses, boilerplate, quotes), which
# none of the document-level signals isolate.
# ---------------------------------------------------------------------------

#: Sliding-window width in tokens. The paper dedups 50-token substrings
#: via a suffix array; the distributed equivalent is fixed-width token
#: windows hashed and grouped - W=8 matches the fixture's ~dozens-of-
#: tokens docs (at 100 TB: W=50, stride>1 for the first pass, xxhash64
#: instead of md5, and only (hash, doc, pos) - never window text -
#: crosses the shuffle).
SUBSTR_W = 8

_SUBSTR_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(LOWER(text), '\\s+'),
                       x -> x <> '') AS w
    FROM documents
),
wins AS (
    SELECT doc_id, CAST(s AS INT) AS s,
           md5(array_to_string(list_slice(w, s, s + {SUBSTR_W - 1}), ' '))
               AS h
    FROM toks, UNNEST(range(1, len(w) - {SUBSTR_W} + 2)) AS t(s)
),
dup AS (SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
dwin AS (SELECT w.doc_id, w.s FROM wins w JOIN dup USING (h)),
marked AS (
    SELECT doc_id, s,
           MAX(s + {SUBSTR_W - 1}) OVER (
               PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
    FROM dwin
),
agg AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS dup_window_count,
           CAST(SUM(CASE WHEN prev_end IS NULL OR s > prev_end
                         THEN 1 ELSE 0 END) AS BIGINT) AS dup_span_count,
           CAST(SUM(GREATEST(0, s + {SUBSTR_W - 1}
                    - GREATEST(s - 1, COALESCE(prev_end, 0)))) AS BIGINT)
               AS dup_tokens_covered
    FROM marked GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       COALESCE(a.dup_window_count, CAST(0 AS BIGINT)) AS dup_window_count,
       COALESCE(a.dup_span_count, CAST(0 AS BIGINT)) AS dup_span_count,
       COALESCE(a.dup_tokens_covered, CAST(0 AS BIGINT))
           AS dup_tokens_covered,
       CASE WHEN len(t.w) > 0
            THEN CAST(COALESCE(a.dup_tokens_covered, 0) AS DOUBLE)
                 / len(t.w)
            ELSE CAST(0.0 AS DOUBLE) END AS dup_fraction
FROM toks t
LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
"""


def substring_spans(docs: DataFrame,
                    window: int = SUBSTR_W) -> DataFrame:
    """Cross-document verbatim-span detection: every `window`-token
    sliding window is hashed; a window is DUPLICATED if its hash occurs
    in >= 2 distinct documents; overlapping duplicated windows merge
    into maximal spans per document (interval-union via a running-max
    window over start positions - integer arithmetic throughout). Per
    doc: window/span counts, tokens covered by the span union, and the
    covered fraction. `docs` needs (doc_id, text).

    Scale shape: the window explode is row-local (~len rows per doc);
    the duplicate test is ONE hash groupBy (map-side combined - the
    same shuffle shape as exact dedup, on ~len x corpus rows); the join
    back is an equi-join on the hash; the span merge is a per-doc
    window (partition-local sort, parallel across docs). No pairwise
    stage at all - unlike near-dup, substring dedup never materializes
    document PAIRS, which is what makes the paper's approach viable at
    corpus scale."""
    from pyspark.sql import Window as W_

    w_width = window
    toks = _tokens(docs)
    starts = F.when(
        F.size("w") >= w_width,
        F.sequence(F.lit(1), F.size("w") - w_width + 1)
    ).otherwise(F.array().cast("array<int>"))
    # unhex: the 32-char md5 hex collapses to 16-byte binary before the
    # shuffle+sort - injective, so the duplicate SET is unchanged (and h
    # never leaves the plan), but the window sort compares half the key
    # bytes.
    wins = (toks.select("doc_id", "w", F.explode(starts).alias("s"))
            .select("doc_id", "s",
                    F.unhex(F.md5(F.concat_ws(
                        " ", F.slice(F.col("w"), F.col("s"), w_width))))
                    .alias("h")))
    # ">= 2 distinct docs share h" == "min(doc_id) != max(doc_id) over
    # the h partition": ONE shuffle of the window relation (the largest
    # relation in the engine) computes the duplicate test in-place,
    # where groupBy(h)+join-back shuffles it twice AND re-runs the
    # tokenize/explode/md5 lineage for each branch (measured at the
    # 100x curve point: 178 s -> this rewrite is the fix for its
    # creeping per-unit cost).
    wh = W_.partitionBy("h")
    dwin = (wins
            .withColumn("_dup", F.min("doc_id").over(wh)
                        != F.max("doc_id").over(wh))
            .where("_dup").select("doc_id", "s"))
    prev = (W_.partitionBy("doc_id").orderBy("s")
            .rowsBetween(W_.unboundedPreceding, -1))
    end = F.col("s") + (w_width - 1)
    marked = dwin.withColumn("prev_end", F.max(end).over(prev))
    agg = (marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dup_window_count"),
        F.sum(F.when(F.col("prev_end").isNull()
                     | (F.col("s") > F.col("prev_end")), 1).otherwise(0))
        .alias("dup_span_count"),
        F.sum(F.greatest(
            F.lit(0),
            end - F.greatest(F.col("s") - 1,
                             F.coalesce("prev_end", F.lit(0)))))
        .alias("dup_tokens_covered")))
    n_tokens = F.size("w").cast("bigint")
    covered = F.coalesce("dup_tokens_covered", F.lit(0)).cast("bigint")
    return (toks.select("doc_id", n_tokens.alias("n_tokens"))
            .join(agg, "doc_id", "left")
            .select(
                "doc_id", "n_tokens",
                F.coalesce("dup_window_count", F.lit(0)).cast("bigint")
                .alias("dup_window_count"),
                F.coalesce("dup_span_count", F.lit(0)).cast("bigint")
                .alias("dup_span_count"),
                covered.alias("dup_tokens_covered"),
                F.when(F.col("n_tokens") > 0,
                       covered.cast("double") / F.col("n_tokens"))
                .otherwise(F.lit(0.0)).alias("dup_fraction"))
            .orderBy("doc_id"))


@register("dedup_substring_spans", oracle=_SUBSTR_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`substring_spans` over the documents table - the Lee et al.
    2022 substring-dedup axis as a driver row."""
    return substring_spans(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Incremental (delta-vs-corpus) near-dup - the daily-ingest shape
# ---------------------------------------------------------------------------

#: Every 5th document plays the "incoming batch"; the rest are the
#: standing corpus. Deterministic, self-contained fixture split.
_INCR_PRED = "doc_id % 5 = 0"

_INCR_ORACLE = f"""
WITH {{buckets}},
{{cands}},
toksets AS (
    SELECT doc_id,
           list_distinct(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                     x -> x <> '')) AS ts
    FROM documents
),
cross_pairs AS (
    SELECT c.doc_a, c.doc_b
    FROM cands c
    JOIN toksets a ON c.doc_a = a.doc_id
    JOIN toksets b ON c.doc_b = b.doc_id
    WHERE (c.doc_a % 5 = 0) <> (c.doc_b % 5 = 0)
      AND len(list_intersect(a.ts, b.ts)) >=
          0.5 * (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
),
hits AS (
    SELECT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM cross_pairs GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(h.n_matches, 0) > 0 AS is_duplicate,
       COALESCE(h.n_matches, CAST(0 AS BIGINT)) AS n_matches
FROM (SELECT doc_id FROM documents WHERE {_INCR_PRED}) d
LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""


@register(
    "dedup_incremental",
    oracle=_INCR_ORACLE.format(buckets=lsh_buckets_sql(),
                               cands=_CANDIDATES_SQL),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-vs-corpus near-dup: flag each INCOMING document (fixture:
    doc_id % 5 == 0) that token-Jaccard-duplicates a STANDING-corpus
    document - the day-2 ingestion shape. Candidates come from the same
    banded LSH equi-join, restricted to cross-set pairs, so the work is
    |delta| x bucket-collision sized, never corpus x corpus. In
    production the corpus side's (doc_id, band, bucket) relation is
    PERSISTED (bucketed by (band, bucket)) and only the delta is
    shingled+minhashed per batch - the join reads the delta's buckets
    against the stored table; nothing else recomputes."""
    docs = load_table(spark, sf_dir, "documents")
    incoming_pred = F.col("doc_id") % 5 == 0
    cands = lsh_candidates(lsh_buckets(docs))
    cross = cands.where(
        (F.col("doc_a") % 5 == 0) != (F.col("doc_b") % 5 == 0))
    toksets = docs.select(
        "doc_id", F.array_distinct(word_array("text")).alias("ts"))
    ts_a = toksets.select(F.col("doc_id").alias("doc_a"),
                          F.col("ts").alias("ts_a"))
    ts_b = toksets.select(F.col("doc_id").alias("doc_b"),
                          F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    union_sz = F.size("ts_a") + F.size("ts_b") - inter
    passing = (cross.join(ts_a, "doc_a").join(ts_b, "doc_b")
               .where(inter >= 0.5 * union_sz))
    hits = (passing
            .select(F.when(F.col("doc_a") % 5 == 0, F.col("doc_a"))
                    .otherwise(F.col("doc_b")).alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_matches")))
    return (docs.where(incoming_pred).select("doc_id")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    (F.coalesce("n_matches", F.lit(0)) > 0)
                    .alias("is_duplicate"),
                    F.coalesce("n_matches", F.lit(0)).cast("bigint")
                    .alias("n_matches"))
            .orderBy("doc_id"))
