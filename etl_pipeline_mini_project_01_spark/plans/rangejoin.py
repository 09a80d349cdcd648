"""Range-join query surface: events.value binned into a LARGE irregular
interval dimension via the bucketed rewrite (operators/rangejoin.py).

The band dim is generated, not stored: 100 gapless irregular intervals
whose breakpoints are direct md5-derived functions of the band index -
bit-identical in Spark and DuckDB (md5 hex is engine-neutral, int->double
and the /100.0 are exact IEEE ops), so the oracle can rebuild the exact
same dim and check the join with its native range join."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.rangejoin import bucketed_range_join
from .parity import dsum, sql_dsum
from .registry import register

N_BANDS = 100
STRIDE = 4.0  # >= max band width (3.0) -> each interval spans <=2 buckets


def _frac(c: Column) -> Column:
    """md5-derived jitter in [0, 1): (md5_32(i) % 100) / 100."""
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
    return (h.cast("bigint") % 100) / F.lit(100.0)


_SQL_FRAC = ("(list_reduce(list_transform(string_split("
             "substr(md5(CAST({x} AS VARCHAR)), 1, 8), ''), "
             "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
             "(a, b) -> a * 16 + b) % 100) / 100.0")


@register(
    "rangejoin_value_bands",
    oracle=f"""
WITH bands AS (
    SELECT i AS band_id,
           2 * i + {_SQL_FRAC.format(x='i')} AS lo,
           2 * (i + 1) + {_SQL_FRAC.format(x='i + 1')} AS hi
    FROM range(0, {N_BANDS}) t(i)
)
SELECT b.band_id,
       COUNT(*) AS n_events,
       {sql_dsum('e.value')} AS total_value
FROM events e
JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band_id
ORDER BY b.band_id
""",
)
def rangejoin_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-dim interval join, bucketed: 100 irregular gapless bands
    (width 2 +/- 1, md5-jittered breakpoints), points and intervals both
    mapped to stride-4 buckets, equi-join on bucket + exact range filter,
    then per-band rollup. The oracle uses DuckDB's native range join over
    the identically-generated dim - proving the rewrite is exact, not
    approximate. At 10^6 bands the BNLJ alternative is O(rows x bands);
    this stays O(rows) + a bounded explode."""
    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    i = F.col("id")
    bands = spark.range(N_BANDS).select(
        i.alias("band_id"),
        (2 * i + _frac(i)).alias("lo"),
        (2 * (i + 1) + _frac(i + 1)).alias("hi"))
    joined = bucketed_range_join(events, "value", bands, "lo", "hi", STRIDE)
    return (joined.groupBy("band_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value", "total_value"))
            .orderBy("band_id"))


def _gapped_bands(spark: SparkSession) -> DataFrame:
    """Every third band removed -> guaranteed unmatched points (their
    values fall in a gap) alongside unmatched bands (ids past the
    points' value cutoff), so both null-extension directions of the
    outer modes carry rows."""
    i = F.col("id")
    return (spark.range(N_BANDS)
            .where(i % 3 != 0)
            .select(i.alias("band_id"),
                    (2 * i + _frac(i)).alias("lo"),
                    (2 * (i + 1) + _frac(i + 1)).alias("hi")))


_SQL_GAPPED_BANDS = f"""
    SELECT i AS band_id,
           2 * i + {_SQL_FRAC.format(x='i')} AS lo,
           2 * (i + 1) + {_SQL_FRAC.format(x='i + 1')} AS hi
    FROM range(0, {N_BANDS}) t(i) WHERE i % 3 <> 0
"""


@register(
    "rangejoin_outer_modes",
    oracle=f"""
WITH bands AS ({_SQL_GAPPED_BANDS}),
pts AS (SELECT event_id, value FROM events WHERE value < 100),
r AS (
    SELECT 'right' AS mode, b.band_id,
           COUNT(*) AS n_rows,
           COUNT(p.value) AS n_matched,
           {sql_dsum('p.value')} AS total_value
    FROM pts p RIGHT JOIN bands b ON p.value >= b.lo AND p.value < b.hi
    GROUP BY b.band_id
),
f AS (
    SELECT 'full' AS mode, COALESCE(b.band_id, -1) AS band_id,
           COUNT(*) AS n_rows,
           COUNT(p.value) AS n_matched,
           {sql_dsum('p.value')} AS total_value
    FROM pts p FULL JOIN bands b ON p.value >= b.lo AND p.value < b.hi
    GROUP BY COALESCE(b.band_id, -1)
)
SELECT * FROM r UNION ALL SELECT * FROM f
ORDER BY mode, band_id
""",
)
def rangejoin_outer_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right- and full-outer bucketed range joins (VERDICT r11 #2)
    checked against DuckDB's NATIVE right/full range joins on an
    identically-generated gapped dim. The interval side is bucket-
    exploded, so the naive outer join would emit one null-extended row
    per exploded copy of each unmatched band; the operator's row-id
    core+remainder rewrite must emit exactly one. n_rows vs n_matched
    pins that class of bug: an empty band must contribute n_rows=1,
    n_matched=0, and the full mode's gap bucket (band_id=-1) must hold
    each gap-value event exactly once."""
    events = (load_table(spark, sf_dir, "events")
              .where(F.col("value") < 100)
              .select("event_id", "value"))
    bands = _gapped_bands(spark)

    def rollup(joined: DataFrame, mode: str, band: Column) -> DataFrame:
        return (joined.groupBy(band.alias("band_id"))
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.count("value").alias("n_matched"),
                     dsum("value", "total_value"))
                .select(F.lit(mode).alias("mode"), "band_id",
                        "n_rows", "n_matched", "total_value"))

    right = rollup(
        bucketed_range_join(events, "value", bands, "lo", "hi", STRIDE,
                            how="right"),
        "right", F.col("band_id"))
    full = rollup(
        bucketed_range_join(events, "value", bands, "lo", "hi", STRIDE,
                            how="full"),
        "full", F.coalesce(F.col("band_id"), F.lit(-1).cast("bigint")))
    return right.unionByName(full).orderBy("mode", "band_id")
