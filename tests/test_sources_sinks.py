"""Auxiliary format round-trips (S7) + foreachBatch deployment sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.plans import Context, import_all_models
from dbt_tpch_spark.sources import read_csv, read_table, write_csv

import_all_models()


def test_csv_round_trip(spark, sf_dir, tmp_path):
    ctx = Context(spark, sf_dir)
    daily = ctx.ref("metrics_daily_revenue")
    path = str(tmp_path / "daily_csv")
    write_csv(daily, path)
    back = read_csv(
        spark,
        path,
        "order_date timestamp, order_count long, gross_revenue double, "
        "net_revenue double, total_discounts double, total_tax double",
    )
    assert back.count() == daily.count()
    a = daily.agg(F.sum("gross_revenue")).first()[0]
    b = back.agg(F.sum("gross_revenue")).first()[0]
    assert abs(a - b) < 1e-6 * abs(a)


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    from dbt_tpch_spark.streaming.windows import stream_events_to_parquet

    out = str(tmp_path / "events_out")
    ckpt = str(tmp_path / "ckpt")
    stream_events_to_parquet(spark, sf_dir, out, ckpt)
    landed = spark.read.parquet(out)
    src_n = read_table(spark, sf_dir, "events").count()
    assert landed.count() == src_n
    assert "batch_id" in landed.columns


def test_orc_round_trip(spark, sf_dir, tmp_path):
    from dbt_tpch_spark.sources import read_orc, read_table, write_orc

    nation = read_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
