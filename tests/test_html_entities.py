"""F1 full entity handling: the JVM-side chain must match the stdlib's
html.unescape on its covered classes, and the pandas_udf escape hatch
must cover what the chain declares out of scope (astral plane, exotic
named entities)."""

from __future__ import annotations

import html

from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.functions.text import (
    NAMED_ENTITIES_FULL,
    unescape_entities,
    unescape_html_udf,
)

CASES = [
    "R&eacute;sum&eacute; &ldquo;caf&eacute;&rdquo;",
    "&#8212; dash &#x2713; check &#65;Z",
    "&amp;#39; stays literal",            # single-pass double-escape trap
    "a &lt;b&gt; &quot;c&quot; &apos;d&apos; &nbsp;",
    "&copy; &reg; &trade; &euro;100 &frac12;",
    "no entities at all",
    "",
]


def test_jvm_chain_matches_stdlib_unescape(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               ["i", "t"])
    got = {r["i"]: r["out"] for r in
           df.select("i", unescape_entities("t").alias("out")).collect()}
    for i, s in enumerate(CASES):
        assert got[i] == html.unescape(s), (s, got[i], html.unescape(s))


def test_named_table_is_stdlib_derived():
    for entity, char in NAMED_ENTITIES_FULL:
        assert char == html.unescape(entity)
    assert NAMED_ENTITIES_FULL[-1][0] == "&amp;"  # single-pass ordering


def test_decimal_astral_entities_stay_untouched_in_jvm_chain(spark):
    """ADVICE r2: a 5-digit decimal entity above the BMP (&#65536;+) must
    pass through the JVM chain UNMODIFIED (its 5-hex-digit form would be
    lpad-truncated to a wrong BMP char) - astral decode is the pandas
    UDF's contract - while BMP 5-digit decimals still decode."""
    cases = [
        "grin &#128512; end",        # astral: untouched
        "edge &#70000; end",         # astral: untouched
        "bmp &#65535; end",          # 5-digit but BMP: decodes
        "bmp &#8212; end",           # 4-digit BMP: decodes
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)],
                               ["i", "t"])
    got = {r["i"]: r["out"] for r in
           df.select("i", unescape_entities("t").alias("out")).collect()}
    assert got[0] == cases[0]
    assert got[1] == cases[1]
    assert got[2] == "bmp ￿ end"
    assert got[3] == html.unescape(cases[3])
    # and the escape hatch finishes the job the chain declares out of scope
    udf_got = (df.select("i", unescape_html_udf()(F.col("t")).alias("out"))
               .collect())
    assert {r["i"]: r["out"] for r in udf_got}[0] == html.unescape(cases[0])


def test_pandas_udf_escape_hatch_covers_astral_and_exotic(spark):
    exotic = ["&#x1F600; grin", "&clubs; &hearts;", "&amp;#39;", None]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(exotic)],
                               ["i", "t"])
    got = {r["i"]: r["out"] for r in
           df.select("i", unescape_html_udf()(F.col("t")).alias("out"))
           .collect()}
    assert got[0] == html.unescape(exotic[0])  # astral plane emoji
    assert got[1] == html.unescape(exotic[1])  # exotic named
    assert got[2] == "&#39;"
    assert got[3] is None
