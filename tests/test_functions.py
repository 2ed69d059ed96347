"""Unit tests for the macro layer (functions/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.functions import (
    days_between,
    money,
    safe_div,
    surrogate_key,
)


def test_money_rounds_to_4dp(spark):
    df = spark.createDataFrame([(1.23456,), (2.00005,), (-3.99999,)], ["x"])
    rows = df.select(money(F.col("x")).alias("m")).collect()
    assert rows[0].m == 1.2346
    assert abs(rows[1].m - 2.0001) < 1e-12 or abs(rows[1].m - 2.0000) < 1e-12
    assert rows[2].m == -4.0


def test_surrogate_key_matches_dbt_utils_semantics(spark):
    # dbt_utils.generate_surrogate_key(['a','b']) = md5(concat parts with '-',
    # nulls -> sentinel). Checked against hashlib.
    import hashlib

    df = spark.createDataFrame([(1, 2), (None, 7)], ["a", "b"])
    rows = (
        df.select(surrogate_key(F.col("a"), F.col("b")).alias("k"))
        .orderBy("k")
        .collect()
    )
    expect = sorted(
        [
            hashlib.md5(b"1-2").hexdigest(),
            hashlib.md5(b"_dbt_utils_surrogate_key_null_-7").hexdigest(),
        ]
    )
    assert sorted(r.k for r in rows) == expect


def test_safe_div_null_on_zero(spark):
    df = spark.createDataFrame([(1.0, 0.0), (4.0, 2.0)], ["n", "d"])
    rows = df.select(safe_div(F.col("n"), F.col("d")).alias("q")).collect()
    assert rows[0].q is None
    assert rows[1].q == 2.0


def test_days_between(spark):
    df = spark.sql(
        "SELECT timestamp'1998-12-01 00:00:00' AS a, timestamp'1998-09-02 00:00:00' AS b"
    )
    row = df.select(days_between(F.col("a"), F.col("b")).alias("d")).collect()[0]
    assert row.d == 90
