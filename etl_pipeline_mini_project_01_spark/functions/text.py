"""Text expressions: HTML cleaning and string shaping (SURVEY §2.5 F1, F6-F8).

The reference cleans HTML with a row-at-a-time Python UDF
(/root/reference/src/transformer/text_cleaner.py:16-43: <br> -> space,
strip tags, unescape entities, collapse whitespace, trim). Here it is a
chain of JVM-side built-ins (regexp_replace/replace/trim) so the hot path
never leaves whole-stage codegen - the 10-100x rule for UDF avoidance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal HTML entity map (the reference relies on html.unescape; the
#: engine keeps the common entities JVM-side and leaves exotic ones to an
#: optional pandas_udf escape hatch).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),  # &amp; last
)


def clean_html(col: str | Column) -> Column:
    """F1: tag-strip + entity-unescape + whitespace-collapse + trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<br\s*/?>", " ")
    c = F.regexp_replace(c, r"<[^>]+>", "")
    for entity, char in HTML_ENTITIES:
        c = F.replace(c, F.lit(entity), F.lit(char))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def preview(col: str | Column, n: int = 200) -> Column:
    """F6: LEFT(x, n) content preview (gold/02:59,241)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def word_array(col: str | Column) -> Column:
    """F8: STRING_TO_ARRAY on whitespace, empty tokens removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")
