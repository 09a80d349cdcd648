"""Regression tests for the driver-faithful canonicalization: the two
failure classes the real grading driver caught in round 1 but the old
collect()-based mimic missed MUST reproduce through this path.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from driver_mimic import canon_frame


def test_hugeint_sum_vs_bigint_is_a_mismatch():
    """DuckDB bare-integer SUM -> HUGEINT -> pandas float64: canon must
    see a DIFFERENT value than an int64 123 (round 1: g1, dedup_simhash,
    dedup_ngram_jaccard all failed exactly here)."""
    con = duckdb.connect()
    hug = con.sql("SELECT SUM(x) AS n FROM (VALUES (100), (23)) t(x)").df()
    big = con.sql(
        "SELECT CAST(SUM(x) AS BIGINT) AS n FROM (VALUES (100), (23)) t(x)"
    ).df()
    assert str(hug["n"].dtype) == "float64"  # the HUGEINT artifact
    assert str(big["n"].dtype) == "int64"
    assert canon_frame(hug) != canon_frame(big)
    assert canon_frame(hug)[1] == [(("f", "123.0"),)]
    assert canon_frame(big)[1] == [(("i", 123),)]


def test_far_future_timestamp_crashes_arrow_topandas(spark):
    """A 9999-12-31 timestamp column must blow up toPandas (pandas ns max
    is 2262-04-11) - round 1's m1_scd2_account_dim crash. The SCD2
    sentinel therefore has to stay Arrow-safe."""
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '9999-12-31 00:00:00' AS valid_to")
    with pytest.raises(Exception, match="(?i)out of bounds|arrow"):
        df.toPandas()


def test_scd2_sentinel_is_arrow_safe(spark):
    from etl_pipeline_mini_project_01_spark.operators.scd import FAR_FUTURE
    pdf = spark.sql(
        f"SELECT TIMESTAMP_NTZ '{FAR_FUTURE}' AS valid_to").toPandas()
    assert pdf["valid_to"].iloc[0].year == 2200


def test_decimal_magnitude_doubles_compare_quantized():
    """VERDICT r10 #7: above 2^53 a single-ulp divergence between
    Spark's decimal-sum->double cast and DuckDB's DECIMAL->float64
    materialization is the ORACLE harness's double-rounding, not an
    engine bug (q1 at ~sf1.0). canon quantizes that magnitude range to
    15 significant digits so the sf1.0 mimic sweep stops charging the
    engine for it - while sub-2^53 floats (every driver-SF value) keep
    exact repr identity."""
    from driver_mimic import canon

    big = 1.2345678901234567e17              # > 2^53
    one_ulp_up = float(np.nextafter(big, np.inf))
    assert canon(big) == canon(one_ulp_up)   # quantized: ulp noise gone
    assert canon(big)[0] == "f15"
    small = 1234567.89
    assert canon(small) != canon(float(np.nextafter(small, np.inf)))
    assert canon(small)[0] == "f"            # exact repr below 2^53

    # ADVICE r11: a 1-ulp pair STRADDLING 2^53 itself (one side the
    # largest double below, the other exactly 2^53) must land in ONE
    # regime - the cutoff sits a >4-ulp band below the boundary, so
    # both quantize and compare equal instead of ("f", ...) vs
    # ("f15", ...) flagging harness noise as a mismatch.
    below = float(np.nextafter(2.0 ** 53, 0.0))      # 2^53 - 1 rep'able
    assert canon(below) == canon(2.0 ** 53)
    assert canon(below)[0] == "f15" == canon(2.0 ** 53 - 2.0)[0]
    # ...while the band stays narrow: values ~1e-14 below keep exact repr
    assert canon(2.0 ** 53 * (1 - 1e-13))[0] == "f"

    # F15 sweep mode: every float quantizes (the DECIMAL->float64
    # multiply-by-binary-10^-scale 1-ulp noise occurs at ANY magnitude
    # - q1's 4.36e10 sum_charge at 10x is well under 2^53)
    import driver_mimic
    try:
        driver_mimic.F15 = True
        q1 = 43579985256.93967
        assert canon(q1) == canon(43579985256.939674) == ("f15", "43579985256.9397")
    finally:
        driver_mimic.F15 = False
