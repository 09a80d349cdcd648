"""Text/JSON query set (SURVEY §2.5 F1-F5, §2.7 X1).

The reference's entire transformer UDF layer (/root/reference/src/
transformer/text_cleaner.py:16-74, json_extractor.py:15-149) collapses to
JVM built-ins here: regexp chains for HTML, from_json/get_json_object for
extraction, explode for UNNEST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import NAMED_ENTITIES_FULL, clean_html, word_array
from .registry import register


def _sql_named_entities(expr: str) -> str:
    """Nested replace() chain over the SAME table Spark uses - generated
    from one source so the twins cannot drift."""
    out = expr
    for entity, char in NAMED_ENTITIES_FULL:
        out = f"replace({out}, '{entity}', '{char.replace(chr(39), chr(39)*2)}')"
    return out


#: DuckDB twins of decode_numeric_entities: fold replace() over the
#: distinct extracted entities; chr() is unicode-native in DuckDB. The
#: <= 65535 filter mirrors the Spark-side BMP guard (astral decimal
#: entities stay untouched on BOTH engines).
_SQL_DEC = """list_reduce(
    list_prepend(txt, list_filter(
        list_distinct(regexp_extract_all(txt, '&#[0-9]{1,5};')),
        e -> CAST(substr(e, 3, len(e)-3) AS INT) <= 65535)),
    (acc, e) -> replace(acc, e, chr(CAST(substr(e, 3, len(e)-3) AS INT))))"""

_SQL_HEX = """list_reduce(
    list_prepend(txt, list_distinct(regexp_extract_all(txt, '&#[xX][0-9a-fA-F]{1,4};'))),
    (acc, e) -> replace(acc, e, chr(CAST(list_reduce(
        list_transform(string_split(LOWER(substr(e, 4, len(e)-4)), ''),
                       c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        (x, y) -> x * 16 + y) AS INT))))"""


@register(
    "f1_html_clean",
    oracle="""
SELECT doc_id,
       TRIM(regexp_replace(
           replace(replace(replace(replace(replace(replace(
               regexp_replace(
                   regexp_replace('<p>' || text || '</p><br/>&amp; <b>fin</b>',
                                  '<br\\s*/?>', ' ', 'g'),
                   '<[^>]+>', '', 'g'),
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
           '\\s+', ' ', 'g')) AS text_clean
FROM documents
""",
)
def f1_html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: HTML strip + entity unescape + whitespace collapse, as a pure
    built-in chain (reference uses a per-row Python UDF). The harness
    documents carry no markup, so deterministic markup is wrapped around
    each text first - the cleaner must strip it back out."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(F.lit("<p>"), F.col("text"), F.lit("</p><br/>&amp; <b>fin</b>"))
    return docs.select("doc_id", clean_html(dirty).alias("text_clean"))


#: Entity-rich garnish appended to every document: accented named
#: entities, smart quotes, em-dash (decimal), checkmark (hex), the
#: &amp;#39; double-escape trap, and a doc_id-varying decimal entity.
_GARNISH = ("<p>R&eacute;sum&eacute; &ldquo;caf&eacute;&rdquo; "
            "&#8212; &#x2713; &amp;#39; letter=&#")


@register(
    "f1_html_entities",
    oracle=f"""
WITH dirty AS (
    SELECT doc_id,
           text || ' {_GARNISH}' || CAST(65 + doc_id % 26 AS VARCHAR)
                || ';</p>' AS txt
    FROM documents
),
stripped AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(txt, '<br\\s*/?>', ' ', 'g'),
                          '<[^>]+>', '', 'g') AS txt
    FROM dirty
),
num_dec AS (SELECT doc_id, {_SQL_DEC} AS txt FROM stripped),
num_hex AS (SELECT doc_id, {_SQL_HEX} AS txt FROM num_dec)
SELECT doc_id,
       TRIM(regexp_replace({_sql_named_entities('txt')}, '\\s+', ' ', 'g'))
           AS text_clean
FROM num_hex
ORDER BY doc_id
""",
)
def f1_html_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 full entity coverage (reference html.unescape at
    text_cleaner.py:33): numeric decimal + hex entities decoded JVM-side
    (regexp_extract_all -> fold replace -> JSON \\uXXXX decode), then the
    full named table. The fixture garnishes each document with accented
    names, smart quotes, an em-dash, a hex checkmark, the &amp;#39;
    double-escape trap (must yield literal &#39;), and a doc_id-varying
    numeric entity so every row decodes differently."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"), F.lit(f" {_GARNISH}"),
        (F.lit(65) + F.col("doc_id") % 26).cast("string"), F.lit(";</p>"))
    return (docs.select(
        "doc_id",
        clean_html(dirty, full_entities=True).alias("text_clean"))
        .orderBy("doc_id"))


@register(
    "f4_json_field_extraction",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       json_extract_string(props, '$.missing') AS missing_field
FROM events
""",
)
def f4_json_field_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: typed JSON field extraction (reference parses account JSON per
    row in json_extractor.py:56-80; here get_json_object, JVM-side).
    Missing path -> NULL, matching the reference's safe extraction."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.select(
        "event_id",
        k.alias("prop_k"),
        (k % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@register(
    "f2_json_array_ops",
    oracle="""
WITH tagged AS (
    SELECT doc_id,
           list_slice(string_split_regex(LOWER(text), '\\s+'), 1, 3) AS tags
    FROM documents
)
SELECT doc_id,
       array_to_string(tags, ',') AS tag_names,
       len(tags) AS tag_count
FROM tagged
""",
)
def f2_json_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3: JSON-list -> CSV-of-field + array length (json_extractor.py:
    15-53 extract_tag_names / count_media). Tags are derived
    deterministically from the text (first 3 tokens) since the harness has
    no tag column; the operators under test are array_join + size."""
    docs = load_table(spark, sf_dir, "documents")
    tags = F.slice(word_array("text"), 1, 3)
    return docs.select(
        "doc_id",
        F.array_join(tags, ",").alias("tag_names"),
        F.size(tags).alias("tag_count"),
    )


@register(
    "f5_json_roundtrip",
    oracle="""
SELECT event_id,
       to_json(struct_pack(user_id := user_id, event_type := event_type))
           AS payload,
       CAST(json_extract_string(
           to_json(struct_pack(user_id := user_id, event_type := event_type)),
           '$.user_id') AS BIGINT) AS user_id_back
FROM events
""",
)
def f5_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: struct -> JSON string (reference json.dumps's nested payloads at
    ingest, hashtag_data_extractor.py:283-290) and back out."""
    events = load_table(spark, sf_dir, "events")
    payload = F.to_json(F.struct("user_id", "event_type"))
    return events.select(
        "event_id",
        payload.alias("payload"),
        F.get_json_object(payload, "$.user_id").cast("bigint").alias("user_id_back"),
    )


@register(
    "x1_token_frequencies",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           TRIM(unnest(string_split_regex(LOWER(text), '\\s+'))) AS term
    FROM documents
)
SELECT term,
       COUNT(*) AS mentions,
       COUNT(DISTINCT doc_id) AS doc_count
FROM toks
WHERE term <> ''
GROUP BY term
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY mentions DESC, term
LIMIT 500
""",
)
def x1_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 + A13: split -> explode -> re-aggregate with HAVING and top-k,
    the mv_hashtag_performance shape (gold/02:144-180)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs
        .select("doc_id", F.explode(word_array("text")).alias("term"))
        .withColumn("term", F.trim("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("mentions"),
            F.countDistinct("doc_id").alias("doc_count"),
        )
        .filter(F.col("doc_count") >= 2)
        .orderBy(F.desc("mentions"), "term")
        .limit(500)
    )
