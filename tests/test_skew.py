"""Salted aggregation/join must be result-equivalent to the plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.operators.skew import salted_aggregate, salted_broadcast_left
from dbt_tpch_spark.sources import read_table


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("q"),
        )
    )
    salted = salted_aggregate(
        li,
        keys=["l_returnflag"],
        partial_aggs=[
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("pq"),
        ],
        final_aggs=[F.sum("pn").alias("n"), F.sum("pq").alias("q")],
        n_salts=16,
        deterministic_by="l_orderkey",
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_broadcast_left_equals_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    supp = read_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey as l_suppkey", "s_name"
    )
    plain = li.join(supp, "l_suppkey")
    salted = salted_broadcast_left(
        li, supp, key="l_suppkey", n_salts=8, deterministic_by="l_orderkey"
    )
    assert salted.count() == plain.count()
    a = salted.groupBy("l_suppkey").count()
    b = plain.groupBy("l_suppkey").count()
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
