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


def test_jvm_chain_fuzz_matches_stdlib_on_bmp(spark):
    """Seeded fuzz: 120 pseudo-random strings mixing named entities,
    decimal/hex numerics across the BMP boundary, double-escapes, and
    plain text. For inputs whose numeric entities are all BMP the chain
    must equal html.unescape exactly; astral decimals must pass through
    untouched while everything else around them still decodes."""
    import hashlib
    import re

    names = [e for e, _ in NAMED_ENTITIES_FULL[:-1]]

    def rnd(i, salt, n):
        return int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8],
                   16) % n

    cases = []
    for i in range(120):
        parts = []
        for j in range(rnd(i, "len", 5) + 1):
            kind = rnd(i * 31 + j, "kind", 5)
            if kind == 0:
                parts.append(names[rnd(i * 7 + j, "name", len(names))])
            elif kind == 1:
                parts.append(f"&#{rnd(i * 13 + j, 'dec', 65536) + 33};")
            elif kind == 2:
                parts.append(f"&#x{rnd(i * 17 + j, 'hex', 0xFFD0) + 33:x};")
            elif kind == 3:
                parts.append(f"&#{rnd(i * 19 + j, 'astral', 34464) + 65536};")
            else:
                parts.append(f"w{rnd(i * 23 + j, 'txt', 100)}")
        cases.append(" ".join(parts))

    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)],
                               ["i", "t"])
    got = {r["i"]: r["out"] for r in
           df.select("i", unescape_entities("t").alias("out")).collect()}
    astral_re = re.compile(r"&#(\d{5,});")
    for i, s in enumerate(cases):
        has_astral = any(int(m) > 0xFFFF for m in astral_re.findall(s))
        if not has_astral:
            assert got[i] == html.unescape(s), (s, got[i])
        else:
            # astral decimals survive verbatim; the rest still decodes
            for m in astral_re.findall(s):
                if int(m) > 0xFFFF:
                    assert f"&#{m};" in got[i], (s, got[i])


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
