"""Table-format seam for the mutation family (VERDICT r5 #4).

The reference mutates Postgres in place (ON CONFLICT upserts,
bronze_loader.py:143-188; SCD2 expire+insert, silver_etl.py:132-234).
The engine re-expresses those as copy-on-write rebuilds over parquet
(operators/scd.py) - correct vs the DuckDB oracles, but a real user
doing CONCURRENT upserts needs a transactional table format. This
module is the documented swap-in point: every merge entry takes a
`fmt` flag and dispatches to

* ``fmt="parquet"`` (default, always available): the window-rewrite /
  anti-join rebuild from operators/scd.py, materialized with the
  staged-then-swap ``atomic_overwrite`` - the exact path every M1/M3/S6
  driver row vouches for;
* ``fmt="delta"``: a true ``MERGE INTO`` through delta-spark's
  ``DeltaTable`` builder - ACID, conflict-detected, no full rewrite.
  ENV-GATED like the torch/protobuf paths: this container has no
  delta-spark wheel, no delta jars in the pyspark distribution, and no
  network route to fetch either (DNS resolution fails for
  repo1.maven.org/pypi.org - verified round 6), so the path raises a
  documented NotImplementedError here and runs wherever delta-spark
  is actually installed. tests/test_table_format.py pins the gate AND
  the parquet-path equivalence with the bare operators.

Semantics contract (both formats): ``merge_upsert_latest`` keeps the
single latest version per key ordered by ``version_cols`` desc, with
the INCOMING row winning equal-version ties (operators/scd.py
upsert_latest, r11 tie-break: Postgres ON CONFLICT DO UPDATE
overwrites unconditionally); the delta builder mirrors it as
whenMatchedUpdate(condition = incoming newer OR tied) +
whenNotMatchedInsert, with the incoming batch pre-deduped to its
per-key latest so the MERGE sees one source row per key (Delta
requires it; the window rewrite gets this for free).
"""

from __future__ import annotations

import importlib.util
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..operators.scd import scd2_merge, upsert_latest
from .io import atomic_overwrite

_DELTA_MSG = (
    "fmt='delta' needs the delta-spark package + Delta jars, absent in "
    "this container (no wheel, no jar, no network to fetch them - see "
    "module docstring). Use fmt='parquet', or install delta-spark and "
    "configure spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension."
)


def delta_available() -> bool:
    """True when the delta-spark python package is importable (the jar
    side is configured at session build; the package import is the
    gate, mirroring torch/protobuf)."""
    return importlib.util.find_spec("delta") is not None


def _latest_per_key(incoming: DataFrame, key: str,
                    version_cols: Sequence[str]) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in version_cols])
    return (incoming.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def merge_upsert_latest(spark: SparkSession, path: str,
                        incoming: DataFrame, key: str,
                        version_cols: Sequence[str],
                        fmt: str = "parquet") -> None:
    """M3/S6 as a table mutation: keep the latest version per key at
    `path`, whatever the storage format."""
    if fmt == "parquet":
        existing = spark.read.parquet(path)
        atomic_overwrite(
            upsert_latest(existing, incoming, key, version_cols), path)
        return
    if fmt != "delta":
        raise ValueError(f"unknown fmt: {fmt}")
    if not delta_available():
        raise NotImplementedError(_DELTA_MSG)
    from delta.tables import DeltaTable

    src = _latest_per_key(incoming, key, version_cols)
    newer = " OR ".join(
        "(" + " AND ".join(
            [f"s.{c} = t.{c}" for c in version_cols[:i]]
            + [f"s.{version_cols[i]} > t.{version_cols[i]}"]) + ")"
        for i in range(len(version_cols)))
    # Incoming wins EQUAL-version ties (r12 review sweep: the parquet
    # path's r11 tie-break - Postgres ON CONFLICT DO UPDATE overwrites
    # unconditionally - while a strictly-newer condition here would
    # have let the standing row win, silently diverging the formats).
    tie = " AND ".join(f"s.{c} = t.{c}" for c in version_cols)
    (DeltaTable.forPath(spark, path).alias("t")
     .merge(src.alias("s"), f"t.{key} = s.{key}")
     .whenMatchedUpdateAll(condition=f"({newer}) OR ({tie})")
     .whenNotMatchedInsertAll()
     .execute())


def merge_scd2(spark: SparkSession, path: str, incoming: DataFrame,
               key: str, tracked: Sequence[str], change_ts: str,
               fmt: str = "parquet") -> None:
    """M1 as a table mutation: SCD Type 2 expire-and-insert at `path`."""
    if fmt == "parquet":
        dim = spark.read.parquet(path)
        atomic_overwrite(
            scd2_merge(dim, incoming, key, tracked, change_ts), path)
        return
    if fmt != "delta":
        raise ValueError(f"unknown fmt: {fmt}")
    if not delta_available():
        raise NotImplementedError(_DELTA_MSG)
    from delta.tables import DeltaTable

    from ..operators.scd import FAR_FUTURE

    # Two-phase Delta SCD2 (the delta-spark docs' recipe, kept to its
    # two obviously-correct primitives): phase 1 is a MERGE that
    # expires current rows whose tracked attrs changed (or use plain
    # <> instead of <=> to reproduce the reference's NULL blindness -
    # operators/scd.py docstring); phase 2 ACID-appends the new
    # versions with an open validity window. Delta's log makes the
    # append transactional, so no staged-swap is needed.
    dim = DeltaTable.forPath(spark, path)
    cur = dim.toDF().filter("is_current")
    changed = (incoming.alias("i")
               .join(cur.alias("c"), key)
               .filter(" OR ".join(f"NOT (i.{a} <=> c.{a})"
                                   for a in tracked))
               .select("i.*"))
    to_insert = changed.unionByName(incoming.join(cur, key, "left_anti"))
    (dim.alias("t")
     .merge(changed.select(key).alias("s"), f"t.{key} = s.{key}"
            " AND t.is_current")
     .whenMatchedUpdate(set={
         "is_current": "false",
         "valid_to": f"CAST('{change_ts}' AS TIMESTAMP_NTZ)"})
     .execute())
    (to_insert
     .withColumn("valid_from",
                 F.lit(change_ts).cast("timestamp_ntz"))
     .withColumn("valid_to", F.lit(FAR_FUTURE).cast("timestamp_ntz"))
     .withColumn("is_current", F.lit(True))
     .write.format("delta").mode("append").save(path))
