"""Inference query surface (U2): the pandas_udf sentiment path (rows-only
- a Python UDF stage is outside DuckDB's reach by definition) plus the
downstream sentiment-distribution rollup the reference notifies on
(discord_notifier.py:96-100) as an oracle-checked pure-SQL twin of the
same lexicon semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.inference import with_sentiment
from .registry import register


#: Per-row oracle of the lexicon scorer (operators/inference.py:41-60)
#: COMPOSED with the UDTF token expansion (the r11 capacity fold - the
#: standalone u3_udtf_tokenize row collapsed into this contract row per
#: plans/registry.py's slot plan): whitespace-regex split == Python
#: str.split(); the 4-decimal confidence is integer half-up on the true
#: rational, then ONE IEEE division - bit-identical to the UDF's
#: emitted double; the 0.75 threshold is the exact integer comparison
#: 4*max < 3*total. The token expansion mirrors the UDTF's totality: a
#: doc with no tokens still emits one (pos=0, token NULL) row, so the
#: sentiment surface never loses rows to the lateral join.
_INFERENCE_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           list_slice(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                  x -> x <> ''), 1, 3) AS t3,
           len(list_filter(string_split_regex(LOWER(text), '\\s+'),
               t -> t IN ('fast','good','small','new','fresh','win','top',
                          'best','clean'))) AS pos,
           len(list_filter(string_split_regex(LOWER(text), '\\s+'),
               t -> t IN ('slow','bad','big','old','error','fail','dup',
                          'worst','stale'))) AS neg
    FROM documents
),
scored AS (
    SELECT doc_id, t3,
           CASE WHEN pos + neg = 0 THEN 'Neutral'
                WHEN 4 * greatest(pos, neg) < 3 * (pos + neg) THEN 'Neutral'
                WHEN pos >= neg THEN 'Positive'
                ELSE 'Negative' END AS sentiment_value,
           CASE WHEN pos + neg = 0 THEN CAST(0.5 AS DOUBLE)
                ELSE CAST((20000 * greatest(pos, neg) + (pos + neg))
                          // (2 * (pos + neg)) AS DOUBLE) / 10000.0
           END AS sentiment_score,
           'lexicon-sentiment-v1' AS sentiment_model
    FROM toks
),
expanded AS (
    SELECT doc_id, i AS pos, t3[i] AS token
    FROM scored, UNNEST(range(1, len(t3) + 1)) t(i)
    UNION ALL
    SELECT doc_id, 0 AS pos, CAST(NULL AS VARCHAR) AS token
    FROM scored WHERE COALESCE(len(t3), 0) = 0
)
SELECT s.doc_id, e.pos, e.token,
       s.sentiment_value, s.sentiment_score, s.sentiment_model
FROM scored s JOIN expanded e ON s.doc_id = e.doc_id
ORDER BY s.doc_id, e.pos
"""


@register("u2_sentiment_inference", oracle=_INFERENCE_ORACLE)
def u2_sentiment_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2+U3/U4 composite (r11 capacity fold): Arrow-batched sentiment
    inference over documents (pandas_udf with per-executor lazy model;
    deterministic lexicon stand-in for the NN) LATERAL-joined to an
    arrow-optimized Python UDTF tokenizing the first 3 terms per doc.
    Both Python surfaces stay Arrow-batched (ArrowEvalPython +
    ArrowEvalPythonUDTF - the registry-wide hygiene guard allows no
    BatchEvalPython anywhere). The UDTF is TOTAL: a doc with no tokens
    emits one (pos=0, NULL) row, so no sentiment row is lost to the
    inner lateral. Deliberately a DEMO of the table-function API - for
    anything this simple explode() is the fast path (JVM, codegen); a
    UDTF earns its cost only when the expansion logic cannot be
    expressed with built-ins. Oracle-checked per row: token-match,
    integer threshold, exact-rational rounding, and the set-based twin
    of the expansion are all SQL-expressible."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string", useArrow=True)
    class Tokenize3:
        def eval(self, doc_id: int, text: str):
            toks = [t for t in (text or "").lower().split() if t][:3]
            if not toks:
                yield doc_id, 0, None
            for i, tok in enumerate(toks, start=1):
                yield doc_id, i, tok

    spark.udtf.register("tokenize3", Tokenize3)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text", *with_sentiment("text")) \
        .createOrReplaceTempView("docs_scored_u2")
    return spark.sql("""
        SELECT s.doc_id, t.pos, t.token,
               s.sentiment_value, s.sentiment_score, s.sentiment_model
        FROM docs_scored_u2 s, LATERAL tokenize3(s.doc_id, s.text) t
        ORDER BY s.doc_id, t.pos
    """)


_LEXICON_SQL = """
WITH toks AS (
    SELECT doc_id,
           len(list_filter(string_split(LOWER(text), ' '),
               t -> t IN ('fast','good','small','new','fresh','win','top',
                          'best','clean'))) AS pos,
           len(list_filter(string_split(LOWER(text), ' '),
               t -> t IN ('slow','bad','big','old','error','fail','dup',
                          'worst','stale'))) AS neg
    FROM documents
),
scored AS (
    SELECT doc_id,
           CASE WHEN pos + neg = 0 THEN 'Neutral'
                WHEN CAST(greatest(pos, neg) AS DOUBLE) / (pos + neg) < 0.75
                     THEN 'Neutral'
                WHEN pos >= neg THEN 'Positive'
                ELSE 'Negative' END AS sentiment_value
    FROM toks
)
SELECT sentiment_value, COUNT(*) AS n
FROM scored
GROUP BY sentiment_value
ORDER BY sentiment_value
"""


@register("u2_sentiment_distribution", oracle=_LEXICON_SQL)
def u2_sentiment_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-over-U2: sentiment distribution with the inference semantics
    (threshold -> Neutral, label mapping) expressed as pure column
    expressions - proving the UDF's logic is exactly the documented
    lexicon (the oracle runs the same lexicon in SQL)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    pos_arr = F.array(*[F.lit(x) for x in sorted(
        {"fast", "good", "small", "new", "fresh", "win", "top", "best", "clean"})])
    neg_arr = F.array(*[F.lit(x) for x in sorted(
        {"slow", "bad", "big", "old", "error", "fail", "dup", "worst", "stale"})])
    pos = F.size(F.filter(w, lambda t: F.array_contains(pos_arr, t)))
    neg = F.size(F.filter(w, lambda t: F.array_contains(neg_arr, t)))
    label = (F.when(pos + neg == 0, "Neutral")
             .when(F.greatest(pos, neg).cast("double") / (pos + neg) < 0.75,
                   "Neutral")
             .when(pos >= neg, "Positive")
             .otherwise("Negative"))
    return (docs.select(label.alias("sentiment_value"))
            .groupBy("sentiment_value")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("sentiment_value"))


# u3_udtf_tokenize was folded into u2_sentiment_inference above (r11
# capacity fold, plans/registry.py slot plan): the UDTF surface it
# vouched for - one row in -> N rows out with custom per-row Python -
# is now the composite's arrow-optimized Tokenize3 stage, checked by
# the same set-based oracle semantics.
