"""Text expressions: HTML cleaning and string shaping (SURVEY §2.5 F1, F6-F8).

The reference cleans HTML with a row-at-a-time Python UDF
(/root/reference/src/transformer/text_cleaner.py:16-43: <br> -> space,
strip tags, unescape entities, collapse whitespace, trim). Here it is a
chain of JVM-side built-ins (regexp_replace/replace/trim) so the hot path
never leaves whole-stage codegen - the 10-100x rule for UDF avoidance.
"""

from __future__ import annotations

import html as _html

import pandas as pd  # module-level so stringized UDF type hints resolve
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal HTML entity map (the fast path for content known to carry only
#: the common six; `unescape_entities` below is the full treatment).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),  # &amp; last
)

#: Broad named-entity table (reference uses html.unescape wholesale,
#: /root/reference/src/transformer/text_cleaner.py:33). Values come from
#: the stdlib's html5 table so they cannot drift from the reference's
#: semantics; &amp; decodes LAST so "&amp;#39;" yields the literal
#: "&#39;", matching html.unescape's single-pass behavior.
_NAMED_ENTITY_NAMES: tuple[str, ...] = (
    "lt", "gt", "quot", "apos", "nbsp", "iexcl", "cent", "pound", "yen",
    "sect", "copy", "reg", "deg", "plusmn", "micro", "para", "middot",
    "frac12", "agrave", "aacute", "acirc", "atilde", "auml", "aring",
    "aelig", "ccedil", "egrave", "eacute", "ecirc", "euml", "igrave",
    "iacute", "icirc", "iuml", "ntilde", "ograve", "oacute", "ocirc",
    "otilde", "ouml", "ugrave", "uacute", "ucirc", "uuml", "yacute",
    "szlig", "ldquo", "rdquo", "lsquo", "rsquo", "ndash", "mdash",
    "hellip", "bull", "euro", "trade", "times", "divide",
    "amp",  # MUST stay last
)
NAMED_ENTITIES_FULL: tuple[tuple[str, str], ...] = tuple(
    (f"&{n};", _html.unescape(f"&{n};")) for n in _NAMED_ENTITY_NAMES)


def _uchar(hex4: Column) -> Column:
    """BMP codepoint (4-digit lowercase hex) -> character, JVM-side: Spark
    has no unicode chr(), but the JSON parser decodes \\uXXXX escapes."""
    return F.from_json(
        F.concat(F.lit('["\\u'), hex4, F.lit('"]')), "array<string>")[0]


def decode_numeric_entities(col: str | Column) -> Column:
    """&#NNNN; and &#xHHHH; -> characters (BMP), pure built-ins: extract
    the distinct entities, then fold replace() over them (F.aggregate).
    Astral-plane codepoints (>0xFFFF, needing surrogate pairs) are left
    to :func:`unescape_html_udf`."""
    c = F.col(col) if isinstance(col, str) else col
    dec = F.array_distinct(F.regexp_extract_all(c, F.lit(r"&#([0-9]{1,5});"),
                                                F.lit(0)))
    # Decimal entities above the BMP (>0xFFFF) must stay untouched: their
    # hex form is 5 digits and lpad(..., 4) would TRUNCATE it to a wrong
    # BMP char. The astral-to-UDF contract already leaves them to
    # unescape_html_udf; this guard enforces it.
    dec = F.filter(dec, lambda e: F.regexp_extract(e, r"&#([0-9]+);", 1)
                   .cast("int") <= 0xFFFF)
    c = F.aggregate(dec, c, lambda acc, e: F.replace(acc, e, _uchar(
        F.lpad(F.lower(F.conv(F.regexp_extract(e, r"&#([0-9]+);", 1), 10, 16)),
               4, "0"))))
    hexe = F.array_distinct(F.regexp_extract_all(
        c, F.lit(r"&#[xX]([0-9a-fA-F]{1,4});"), F.lit(0)))
    return F.aggregate(hexe, c, lambda acc, e: F.replace(acc, e, _uchar(
        F.lpad(F.lower(F.regexp_extract(e, r"&#[xX]([0-9a-fA-F]+);", 1)),
               4, "0"))))


def unescape_entities(col: str | Column) -> Column:
    """Full F1 entity treatment: numeric (dec+hex) first, then the named
    table with &amp; last - html.unescape-equivalent for real content."""
    c = decode_numeric_entities(col)
    for entity, char in NAMED_ENTITIES_FULL:
        c = F.replace(c, F.lit(entity), F.lit(char))
    return c


def unescape_html_udf() -> Column:
    """Escape hatch: the stdlib's full ~2k-entity html.unescape as an
    Arrow-batched pandas UDF (never row-at-a-time) for content where the
    JVM-side chain's coverage (named table + BMP numerics) is not enough
    - e.g. astral-plane &#x1F600; or exotic named entities."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _unescape(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _html.unescape(v) if v is not None else None)

    return _unescape


def clean_html(col: str | Column, full_entities: bool = False) -> Column:
    """F1: tag-strip + entity-unescape + whitespace-collapse + trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<br\s*/?>", " ")
    c = F.regexp_replace(c, r"<[^>]+>", "")
    if full_entities:
        c = unescape_entities(c)
    else:
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
