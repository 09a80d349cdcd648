"""Text-analysis operator family over `documents` (north-star LLM-data
ops): quality scoring, language-ID heuristic, token counting, document
fingerprinting. All pure built-ins - no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import word_array
from .registry import register

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

#: Language marker lexicons for the n-gram/keyword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "de", "y", "es"),
    "fr": ("le", "la", "et", "les", "est"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}

_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


@register(
    "text_quality_scores",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, n_chars,
           list_filter(string_split_regex(LOWER(text), '\\s+'), x -> x <> '') AS w,
           len(regexp_extract_all(LOWER(text), '[^a-z0-9\\s]')) AS punct_count
    FROM documents
)
SELECT doc_id,
       n_chars,
       len(w) AS n_tokens,
       len(list_distinct(w)) AS n_unique_tokens,
       CAST(len(list_distinct(w)) AS DOUBLE) / NULLIF(len(w), 0)
           AS uniqueness_ratio,
       CAST(list_reduce(list_transform(w, t -> len(t)), (a, b) -> a + b)
            AS DOUBLE) / NULLIF(len(w), 0) AS avg_token_len,
       CAST(len(list_filter(w, t -> t IN {STOPWORDS!r})) AS DOUBLE)
         / NULLIF(len(w), 0) AS stopword_ratio,
       CAST(punct_count AS DOUBLE) / NULLIF(n_chars, 0) AS punct_ratio
FROM toks
ORDER BY doc_id
""",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/uniqueness/stopword/punctuation signals per
    document - the standard LLM-corpus quality gate features."""
    docs = load_table(spark, sf_dir, "documents")
    w = word_array("text")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = docs.select(
        "doc_id", "n_chars", w.alias("w"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[^a-z0-9\\s]"), 0))
        .alias("punct_count"))
    n = F.size("w")
    return toks.select(
        "doc_id", "n_chars",
        n.alias("n_tokens"),
        F.size(F.array_distinct("w")).alias("n_unique_tokens"),
        (F.size(F.array_distinct("w")).cast("double") / F.nullif(n, F.lit(0)))
        .alias("uniqueness_ratio"),
        (F.aggregate("w", F.lit(0), lambda a, t: a + F.length(t)).cast("double")
         / F.nullif(n, F.lit(0))).alias("avg_token_len"),
        (F.size(F.filter("w", lambda t: F.array_contains(stop_arr, t)))
         .cast("double") / F.nullif(n, F.lit(0))).alias("stopword_ratio"),
        (F.col("punct_count").cast("double") / F.nullif(F.col("n_chars"), F.lit(0)))
        .alias("punct_ratio"),
    ).orderBy("doc_id")


def _marker_score_sql(markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(w, t -> t IN ({in_list})))"


@register(
    "text_language_id",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, lang AS actual_lang,
           list_filter(string_split_regex(LOWER(text), '\\s+'), x -> x <> '') AS w
    FROM documents
),
scored AS (
    SELECT doc_id, actual_lang,
           {_marker_score_sql(LANG_MARKERS['en'])} AS s_en,
           {_marker_score_sql(LANG_MARKERS['de'])} AS s_de,
           {_marker_score_sql(LANG_MARKERS['es'])} AS s_es,
           {_marker_score_sql(LANG_MARKERS['fr'])} AS s_fr,
           {_marker_score_sql(LANG_MARKERS['zh'])} AS s_zh
    FROM toks
)
SELECT doc_id, actual_lang, s_en, s_de, s_es, s_fr, s_zh,
       CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN NULL
            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh
                 THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
            WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
            WHEN s_fr >= s_zh THEN 'fr'
            ELSE 'zh' END AS predicted_lang
FROM scored
ORDER BY doc_id
""",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: count language-marker tokens per lexicon,
    argmax with a fixed tie order (de > en > es > fr > zh alphabetical-ish,
    frozen identically in both engines); zero evidence -> NULL."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.col("lang").alias("actual_lang"),
        word_array("text").alias("w"))

    def score(markers: tuple[str, ...]) -> F.Column:
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter("w", lambda t: F.array_contains(arr, t)))

    scored = toks.select(
        "doc_id", "actual_lang",
        score(LANG_MARKERS["en"]).alias("s_en"),
        score(LANG_MARKERS["de"]).alias("s_de"),
        score(LANG_MARKERS["es"]).alias("s_es"),
        score(LANG_MARKERS["fr"]).alias("s_fr"),
        score(LANG_MARKERS["zh"]).alias("s_zh"))
    s = {k: F.col(f"s_{k}") for k in ("en", "de", "es", "fr", "zh")}
    predicted = (
        F.when(F.greatest(*s.values()) == 0, F.lit(None))
        .when((s["de"] >= s["en"]) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"])
              & (s["de"] >= s["zh"]), "de")
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
              "en")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh"))
    return (scored.withColumn("predicted_lang", predicted).orderBy("doc_id"))


@register(
    "text_token_counts",
    oracle=f"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS ws_tokens,
       len(regexp_extract_all(LOWER(text), '{_BPE_RE}')) AS bpe_ish_tokens,
       CAST(n_chars AS DOUBLE)
         / NULLIF(len(regexp_extract_all(LOWER(text), '{_BPE_RE}')), 0)
           AS chars_per_token
FROM documents
ORDER BY doc_id
""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens (letter
    runs / digit runs / single symbols) + chars-per-token - the cost
    estimator every training-data pipeline carries."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        (F.col("n_chars").cast("double") / F.nullif(bpe, F.lit(0)))
        .alias("chars_per_token"),
    ).orderBy("doc_id")


#: Canonical stopword list for the Gopher "contains stopwords" rule
#: (Rae et al. 2021 use the-be-to-of-and-that-have-with).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "text_gopher_quality",
    oracle=f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(LOWER(text), '\\s+'), x -> x <> '') AS w
    FROM documents
),
feat AS (
    SELECT doc_id,
           len(w) AS n_tokens,
           list_reduce(list_transform(w, t -> len(t)), (a, b) -> a + b)
               AS sum_len,
           len(list_filter(w, t -> regexp_matches(t, '[a-z]')))
               AS alpha_tokens,
           len(list_distinct(list_filter(w, t -> t IN {GOPHER_STOPWORDS!r})))
               AS n_stopwords
    FROM toks
)
SELECT doc_id, n_tokens,
       n_tokens >= 30 AND n_tokens <= 100000 AS r_word_count,
       sum_len >= 4 * n_tokens AND sum_len <= 10 * n_tokens
           AS r_mean_word_len,
       5 * alpha_tokens >= 4 * n_tokens AS r_alpha_ratio,
       n_stopwords >= 2 AS r_stopwords,
       (n_tokens >= 30 AND n_tokens <= 100000)
           AND (sum_len >= 4 * n_tokens AND sum_len <= 10 * n_tokens)
           AND (5 * alpha_tokens >= 4 * n_tokens)
           AND (n_stopwords >= 2) AS passes_gopher
FROM feat
ORDER BY doc_id
""",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus quality rules (Rae et al. 2021, §A1.1): word
    count bounds, mean-word-length bounds, alphabetic-token ratio,
    stopword presence - each emitted as its own verdict plus the combined
    gate. Every threshold is an INTEGER-scaled comparison (4n <= sum_len,
    5*alpha >= 4n) so the gate is float-free and engine-exact; pure
    column expressions, whole-stage codegen, one scan."""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    feat = docs.select(
        "doc_id", word_array("text").alias("w")).select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.aggregate("w", F.lit(0), lambda a, t: a + F.length(t))
        .alias("sum_len"),
        F.size(F.filter("w", lambda t: t.rlike("[a-z]")))
        .alias("alpha_tokens"),
        F.size(F.array_distinct(
            F.filter("w", lambda t: F.array_contains(stop_arr, t))))
        .alias("n_stopwords"))
    n = F.col("n_tokens")
    r_wc = (n >= 30) & (n <= 100000)
    r_mwl = (F.col("sum_len") >= 4 * n) & (F.col("sum_len") <= 10 * n)
    r_alpha = 5 * F.col("alpha_tokens") >= 4 * n
    r_stop = F.col("n_stopwords") >= 2
    return feat.select(
        "doc_id", "n_tokens",
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_alpha.alias("r_alpha_ratio"),
        r_stop.alias("r_stopwords"),
        (r_wc & r_mwl & r_alpha & r_stop).alias("passes_gopher"),
    ).orderBy("doc_id")


@register(
    "text_repetition",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(LOWER(text), '\\s+'), x -> x <> '') AS w
    FROM documents
),
bg AS (
    SELECT doc_id, w[i] || ' ' || w[i+1] AS g
    FROM toks, UNNEST(range(1, len(w))) t(i)
),
cnt AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
top AS (
    SELECT doc_id, g AS top_bigram, c AS top_bigram_count,
           CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_bigrams,
           row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
    FROM cnt
)
SELECT doc_id, n_bigrams, top_bigram, top_bigram_count,
       top_bigram_count * 10 <= n_bigrams AS passes_repetition
FROM top
WHERE rn = 1
ORDER BY doc_id
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (the duplicated-n-gram corpus gate, Gopher
    §A1.1 'repetitious text'): most frequent word bigram per document and
    its share of all bigrams; verdict = top-bigram share <= 10%,
    integer-scaled (10 * count <= n_bigrams) so it is float-free. One
    explode + one (doc, bigram) hash aggregate + one per-doc window pass;
    ties break on the lexicographically smallest bigram in both
    engines."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array BEFORE indexing into it: w_arr[i] inside
    # the transform lambda re-evaluates the whole regex split per element
    # (no common-subexpression elimination across higher-order-function
    # lambdas), turning the bigram build O(tokens^2) per doc - 13x slower
    # at sf0.1.
    toks = docs.select("doc_id", word_array("text").alias("w"))
    w_arr = F.col("w")
    bigrams = F.when(
        F.size(w_arr) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(w_arr) - 2),
                    lambda i: F.concat_ws(" ", w_arr[i], w_arr[i + 1])),
    ).otherwise(F.array().cast("array<string>"))
    bg = toks.select("doc_id", F.explode(bigrams).alias("g"))
    cnt = bg.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    w_sum = Window.partitionBy("doc_id")
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
    top = cnt.select(
        "doc_id", F.col("g").alias("top_bigram"),
        F.col("c").alias("top_bigram_count"),
        F.sum("c").over(w_sum).alias("n_bigrams"),
        F.row_number().over(w_rank).alias("rn"))
    return (top.where(F.col("rn") == 1)
            .select("doc_id", "n_bigrams", "top_bigram", "top_bigram_count",
                    (F.col("top_bigram_count") * 10 <= F.col("n_bigrams"))
                    .alias("passes_repetition"))
            .orderBy("doc_id"))


@register(
    "text_fingerprint",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           list_sort(list_distinct(
               list_filter(string_split_regex(LOWER(text), '\\s+'),
                           x -> x <> ''))) AS vocab
    FROM documents
)
SELECT doc_id,
       md5(array_to_string(vocab, ' ')) AS vocab_fingerprint,
       list_reduce(
           list_transform(string_split(substr(md5(array_to_string(vocab, ' ')),
                                              1, 8), ''),
                          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
           (a, b) -> a * 16 + b) AS fingerprint_int,
       len(vocab) AS vocab_size
FROM toks
ORDER BY doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct vocabulary (the
    set-hash form of a rolling-hash fingerprint) + 32-bit integer form for
    bucketing. Identical md5 on both engines makes this oracle-exact."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = F.array_sort(F.array_distinct(word_array("text")))
    fp = F.md5(F.array_join(vocab, " "))
    return docs.select(
        "doc_id",
        fp.alias("vocab_fingerprint"),
        F.conv(F.substring(fp, 1, 8), 16, 10).cast("bigint")
        .alias("fingerprint_int"),
        F.size(vocab).alias("vocab_size"),
    ).orderBy("doc_id")
