"""Notification-digest query set (reference Step 6: discord_notifier.py
builds in-memory Polars digests - engagement stats, sentiment
distribution, top positive/negative samples - from the transformed frame,
/root/reference/src/notifier/discord_notifier.py:70-132,354-520).

The engine exposes those digests as queries over the lexicon-sentiment
semantics (U2's SQL-expressible twin), so the full 6-step pipeline
surface is query-addressable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

_POS = ("fast", "good", "small", "new", "fresh", "win", "top", "best", "clean")
_NEG = ("slow", "bad", "big", "old", "error", "fail", "dup", "worst", "stale")


def _scored_docs_sql() -> str:
    return f"""
    SELECT doc_id, text, n_chars,
           len(list_filter(string_split(LOWER(text), ' '),
               t -> t IN {_POS!r})) AS pos,
           len(list_filter(string_split(LOWER(text), ' '),
               t -> t IN {_NEG!r})) AS neg
    FROM documents
"""


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    pos_arr = F.array(*[F.lit(x) for x in _POS])
    neg_arr = F.array(*[F.lit(x) for x in _NEG])
    return docs.select(
        "doc_id", "text", "n_chars",
        F.size(F.filter(w, lambda t: F.array_contains(pos_arr, t))).alias("pos"),
        F.size(F.filter(w, lambda t: F.array_contains(neg_arr, t))).alias("neg"))


@register(
    "p7_top_positive_docs",
    oracle=f"""
WITH scored AS ({_scored_docs_sql()}),
labeled AS (
    SELECT doc_id, n_chars,
           SUBSTRING(text, 1, 200) AS preview,
           CAST(pos AS DOUBLE) / NULLIF(pos + neg, 0) AS positivity,
           CASE WHEN pos + neg = 0 THEN 'Neutral'
                WHEN CAST(greatest(pos, neg) AS DOUBLE) / (pos + neg) < 0.75
                     THEN 'Neutral'
                WHEN pos >= neg THEN 'Positive'
                ELSE 'Negative' END AS sentiment_value
    FROM scored
)
SELECT doc_id, preview, n_chars, positivity
FROM labeled
WHERE LOWER(sentiment_value) = 'positive'
ORDER BY positivity DESC, doc_id
LIMIT 5
""",
)
def p7_top_positive_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 + O2: the notifier's 'top 5 positive toots' digest
    (discord_notifier.py:380-384): filter to the positive class
    (case-insensitive, as the reference lowercases) and take the top-5 by
    score with F6 previews."""
    scored = _scored_docs(spark, sf_dir)
    labeled = scored.select(
        "doc_id", "n_chars",
        F.substring("text", 1, 200).alias("preview"),
        (F.col("pos").cast("double") / F.nullif(F.col("pos") + F.col("neg"),
                                                F.lit(0))).alias("positivity"),
        F.when(F.col("pos") + F.col("neg") == 0, "Neutral")
        .when(F.greatest("pos", "neg").cast("double")
              / (F.col("pos") + F.col("neg")) < 0.75, "Neutral")
        .when(F.col("pos") >= F.col("neg"), "Positive")
        .otherwise("Negative").alias("sentiment_value"))
    return (labeled.filter(F.lower("sentiment_value") == "positive")
            .select("doc_id", "preview", "n_chars", "positivity")
            .orderBy(F.desc("positivity"), "doc_id")
            .limit(5))


@register(
    "digest_run_summary",
    oracle=f"""
WITH scored AS ({_scored_docs_sql()}),
labeled AS (
    SELECT *,
           CASE WHEN pos + neg = 0 THEN 'Neutral'
                WHEN CAST(greatest(pos, neg) AS DOUBLE) / (pos + neg) < 0.75
                     THEN 'Neutral'
                WHEN pos >= neg THEN 'Positive'
                ELSE 'Negative' END AS sentiment_value
    FROM scored
)
SELECT COUNT(*) AS total_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
           AS avg_chars,
       COUNT(CASE WHEN sentiment_value = 'Positive' THEN 1 END) AS n_positive,
       COUNT(CASE WHEN sentiment_value = 'Negative' THEN 1 END) AS n_negative,
       COUNT(CASE WHEN sentiment_value = 'Neutral' THEN 1 END) AS n_neutral,
       CAST(100.0 * COUNT(CASE WHEN sentiment_value = 'Positive' THEN 1 END)
            AS DOUBLE) / NULLIF(COUNT(*), 0) AS positive_pct
FROM labeled
""",
)
def digest_run_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The notifier's run-summary digest (discord_notifier.py:70-132):
    corpus counts, average length, sentiment distribution with A10 pct."""
    scored = _scored_docs(spark, sf_dir)
    labeled = scored.withColumn(
        "sentiment_value",
        F.when(F.col("pos") + F.col("neg") == 0, "Neutral")
        .when(F.greatest("pos", "neg").cast("double")
              / (F.col("pos") + F.col("neg")) < 0.75, "Neutral")
        .when(F.col("pos") >= F.col("neg"), "Positive")
        .otherwise("Negative"))
    is_pos = F.when(F.col("sentiment_value") == "Positive", 1)
    return labeled.agg(
        F.count(F.lit(1)).alias("total_docs"),
        (F.sum(F.col("n_chars").cast("decimal(18,4)")).cast("double")
         / F.count(F.lit(1))).alias("avg_chars"),
        F.count(is_pos).alias("n_positive"),
        F.count(F.when(F.col("sentiment_value") == "Negative", 1))
        .alias("n_negative"),
        F.count(F.when(F.col("sentiment_value") == "Neutral", 1))
        .alias("n_neutral"),
        ((F.lit(100.0) * F.count(is_pos)).cast("double")
         / F.nullif(F.count(F.lit(1)), F.lit(0))).alias("positive_pct"),
    )
