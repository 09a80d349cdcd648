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
