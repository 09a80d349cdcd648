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
    # The matched right row is carried as ONE struct, not per-column
    # last(ignorenulls) calls: per-column carry skipped a matching
    # row's NULL payload value and resurrected a STALER row's value in
    # its place (and could mix columns from different right rows in
    # one output row). The struct is non-null for every right row, so
    # last(struct, ignorenulls) attaches the latest matching right row
    # atomically - a NULL inside its payload stays NULL, matching
    # DuckDB ASOF. Right rows with NULL right_ts are excluded up
    # front: `left.ts >= right.ts` is never true for NULL in the
    # reference semantics, while nulls-first ordering would have made
    # such a row "older than everything" and matched it. NULL join
    # KEYS are excluded for the same reason: the ASOF equality
    # condition never matches NULL = NULL, but partitionBy groups
    # NULL keys together and would have carried a NULL-key right row
    # into NULL-key left rows (left NULL-key rows still flow through
    # the union/window path and correctly get NULL payload).
    r_marked = (right
                .filter(F.col(right_ts).isNotNull()
                        & F.col(key).isNotNull())
                .select(
                    F.col(key),
                    F.col(right_ts).alias("__ts"),
                    F.lit(0).alias("__is_left"),
                    F.struct(*[F.col(p) for p in payload]).alias("__match")))
    struct_type = r_marked.schema["__match"].dataType
    l_marked = (left
                .withColumn("__ts", F.col(left_ts))
                .withColumn("__is_left", F.lit(1))
                .withColumn("__match", F.lit(None).cast(struct_type)))
    unioned = l_marked.unionByName(r_marked, allowMissingColumns=True)
    # Right rows sort before left rows at equal ts -> ties included.
    w = (Window.partitionBy(key).orderBy("__ts", "__is_left")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "__match", F.last("__match", ignorenulls=True).over(w))
    return (carried.filter(F.col("__is_left") == 1)
            .select(*lcols,
                    *[F.col("__match")[p].alias(p) for p in payload]))
