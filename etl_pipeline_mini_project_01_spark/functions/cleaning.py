"""Data-quality column expressions (SURVEY §2.2 P3-P10).

Re-expresses the reference's transform-stage quality fixes
(/root/reference/src/transformer/data_quality.py:24-62 and
text_cleaner.py:79-99) as pure Catalyst column expressions - no UDFs, so
every rule stays inside whole-stage codegen and is pushdown-friendly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def nullify_negative(col: str | Column) -> Column:
    """P3: negative counters are impossible -> NULL
    (data_quality.py:24-32)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c < 0, F.lit(None)).otherwise(c)


def nullify_overlong(col: str | Column, max_len: int) -> Column:
    """P4: values longer than the domain allows -> NULL
    (data_quality.py:35-44, language > 10 chars)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > max_len, F.lit(None)).otherwise(c)


def nullify_out_of_domain(col: str | Column, allowed: Sequence[str]) -> Column:
    """P5: IN-list domain validation -> NULL outside the domain
    (data_quality.py:47-54, visibility domain)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~c.isin(list(allowed)), F.lit(None)).otherwise(c)


def blank_to_null(col: str | Column) -> Column:
    """P6: empty/whitespace-only string -> NULL (text_cleaner.py:79-99)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def normalize_string_nulls(df: DataFrame) -> DataFrame:
    """P6 applied to every string column of a frame."""
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StringType):
            df = df.withColumn(field.name, blank_to_null(field.name))
    return df


def tier(col: str | Column, thresholds: Sequence[tuple[float, str]],
         default: str) -> Column:
    """P10: CASE classification by descending thresholds
    (silver_etl.py:163-167 influence_tier: Mega/Macro/Mid/Micro)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for bound, label in thresholds:
        cond = c >= F.lit(bound)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return (expr.otherwise(default) if expr is not None else F.lit(default))


def null_profile(df: DataFrame) -> DataFrame:
    """A8: one-row per-column null_count / approx-free n_unique summary
    (data_quality.py:66-98)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("row_count")]
    for field in df.schema.fields:
        name = field.name
        aggs.append(
            F.count(F.when(F.col(name).isNull(), 1)).alias(f"{name}_nulls"))
        aggs.append(F.countDistinct(F.col(name)).alias(f"{name}_unique"))
    return df.agg(*aggs)
