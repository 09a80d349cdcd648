"""Table-format seam (sources/table_format.py, VERDICT r5 #4): the
parquet path must be byte-equivalent to the bare operators the driver
rows vouch for, and the delta path must be a REAL env-gate - a
documented NotImplementedError in this container (no delta-spark
wheel, no Delta jars, no network to fetch either), exercised for real
wherever delta-spark exists."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_pipeline_mini_project_01_spark.operators.scd import (
    scd2_initial,
    scd2_merge,
    upsert_latest,
)
from etl_pipeline_mini_project_01_spark.sources.table_format import (
    delta_available,
    merge_scd2,
    merge_upsert_latest,
)


@pytest.fixture()
def tmppath():
    d = tempfile.mkdtemp(prefix="tblfmt_")
    yield d + "/t"
    shutil.rmtree(d, ignore_errors=True)


def _accounts(spark):
    return spark.createDataFrame(
        [(1, "alice", "basic"), (2, "bob", "basic"), (3, "cara", "pro")],
        "account_id bigint, name string, tier string")


def test_parquet_upsert_matches_operator(spark, tmppath):
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "k bigint, v bigint, payload string")
    inc = spark.createDataFrame(
        [(2, 20, "b2"), (3, 10, "c")], "k bigint, v bigint, payload string")
    base.write.parquet(tmppath)
    merge_upsert_latest(spark, tmppath, inc, "k", ["v"])
    got = sorted(map(tuple, spark.read.parquet(tmppath).collect()))
    want = sorted(map(tuple, upsert_latest(base, inc, "k", ["v"]).collect()))
    assert got == want
    assert got == [(1, 10, "a"), (2, 20, "b2"), (3, 10, "c")]


def test_parquet_scd2_matches_operator(spark, tmppath):
    dim0 = scd2_initial(_accounts(spark), "2024-01-01 00:00:00")
    inc = spark.createDataFrame(
        [(2, "bob", "pro"), (4, "dan", "basic")],
        "account_id bigint, name string, tier string")
    dim0.write.parquet(tmppath)
    merge_scd2(spark, tmppath, inc, "account_id", ["name", "tier"],
               "2024-01-15 00:00:00")
    got = sorted(map(tuple, spark.read.parquet(tmppath).collect()))
    want = sorted(map(tuple, scd2_merge(
        dim0, inc, "account_id", ["name", "tier"],
        "2024-01-15 00:00:00").collect()))
    assert got == want
    # bob: expired old version + current pro version; dan inserted
    cur = {(r.account_id, r.tier)
           for r in spark.read.parquet(tmppath).filter("is_current").collect()}
    assert cur == {(1, "basic"), (2, "pro"), (3, "pro"), (4, "basic")}


def test_parquet_swap_is_staged(spark, tmppath):
    """The rebuild goes through atomic_overwrite's staging dance - no
    reader window sees a partial table, and no staging debris stays."""
    import os
    base = spark.createDataFrame([(1, 1)], "k bigint, v bigint")
    base.write.parquet(tmppath)
    merge_upsert_latest(spark, tmppath,
                        spark.createDataFrame([(1, 2)], "k bigint, v bigint"),
                        "k", ["v"])
    assert not os.path.exists(tmppath + ".__staging__")
    assert not os.path.exists(tmppath + ".__old__")
    assert [tuple(r) for r in spark.read.parquet(tmppath).collect()] \
        == [(1, 2)]


@pytest.mark.skipif(delta_available(),
                    reason="delta-spark installed: gate not applicable")
def test_delta_path_is_documented_env_gate(spark, tmppath):
    """This container verifiably cannot run Delta (module docstring:
    no wheel, no jar, no network) - the fmt='delta' branch must say so
    loudly, for BOTH merge entries, and never touch the table."""
    base = spark.createDataFrame([(1, 1)], "k bigint, v bigint")
    base.write.parquet(tmppath)
    inc = spark.createDataFrame([(1, 2)], "k bigint, v bigint")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        merge_upsert_latest(spark, tmppath, inc, "k", ["v"], fmt="delta")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        merge_scd2(spark, tmppath, inc, "k", ["v"],
                   "2024-01-15 00:00:00", fmt="delta")
    # untouched: the gate fired before any write
    assert [tuple(r) for r in spark.read.parquet(tmppath).collect()] \
        == [(1, 1)]


def test_unknown_format_rejected(spark, tmppath):
    base = spark.createDataFrame([(1, 1)], "k bigint, v bigint")
    base.write.parquet(tmppath)
    with pytest.raises(ValueError, match="unknown fmt"):
        merge_upsert_latest(spark, tmppath, base, "k", ["v"], fmt="iceberg")


@pytest.mark.skipif(not delta_available(),
                    reason="delta-spark absent (documented env gate)")
def test_delta_merge_matches_parquet_path(spark, tmppath):
    """Where delta-spark exists: the MERGE INTO path must produce the
    same table state as the window-rewrite (same oracle greens under
    both paths - VERDICT r5 #4's done-criterion)."""
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "k bigint, v bigint, payload string")
    inc = spark.createDataFrame(
        [(2, 20, "b2"), (3, 10, "c")], "k bigint, v bigint, payload string")
    base.write.format("delta").save(tmppath)
    merge_upsert_latest(spark, tmppath, inc, "k", ["v"], fmt="delta")
    got = sorted(map(tuple,
                     spark.read.format("delta").load(tmppath).collect()))
    want = sorted(map(tuple, upsert_latest(base, inc, "k", ["v"]).collect()))
    assert got == want
