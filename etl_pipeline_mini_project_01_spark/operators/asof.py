"""As-of (backward temporal) join - an operator the reference's Postgres
would express as a LATERAL ORDER BY ts DESC LIMIT 1 and DuckDB ships
natively (ASOF JOIN); Spark has no built-in, so the engine composes it
from primitives (SURVEY §2 extension; the canonical composition, not a
UDF):

    union(left-marked, right-marked)
      -> window per key ordered by (ts, marker)
      -> last non-null right payload carried forward
      -> keep left rows

One shuffle on the join key total - same cost as a regular equi-join -
versus the naive theta-join (left.ts >= right.ts) + argmax, which is a
quadratic range join. Ties (right.ts == left.ts) are INCLUDED, matching
DuckDB's `ON left.ts >= right.ts` semantics: the right marker sorts
before the left marker at equal ts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       left_ts: str, right_ts: str,
                       payload: Sequence[str]) -> DataFrame:
    """For every left row, attach `payload` from the right row with the
    greatest right_ts <= left_ts for the same key (NULLs if none).

    The right side must be unique per (key, right_ts) - pre-dedup with a
    deterministic tie-break if it is not (the caller owns that choice,
    exactly like DuckDB ASOF with duplicate timestamps).
    """
    lcols = left.columns
    l_marked = (left
                .withColumn("__ts", F.col(left_ts))
                .withColumn("__is_left", F.lit(1)))
    for p in payload:
        l_marked = l_marked.withColumn(p, F.lit(None).cast(
            dict(right.dtypes)[p]))
    r_marked = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(p) for p in payload])
    for c in lcols:
        if c not in {key} and c not in r_marked.columns:
            r_marked = r_marked.withColumn(c, F.lit(None).cast(
                dict(l_marked.dtypes)[c]))
    unioned = l_marked.unionByName(r_marked, allowMissingColumns=True)
    # Right rows sort before left rows at equal ts -> ties included.
    w = (Window.partitionBy(key).orderBy("__ts", "__is_left")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned
    for p in payload:
        carried = carried.withColumn(p, F.last(p, ignorenulls=True).over(w))
    return carried.filter(F.col("__is_left") == 1).select(*lcols, *payload)
