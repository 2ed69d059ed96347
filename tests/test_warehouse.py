"""Physical-layout checks: partition pruning must reach the scan, bucketed
joins must be exchange-free — the two properties that decide whether the
plan survives a 100x scale-up."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_tpch_spark.plans import Context, import_all_models
from dbt_tpch_spark.warehouse import read_partitioned, write_bucketed, write_partitioned

import_all_models()


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_reaches_scan(spark, sf_dir):
    ctx = Context(spark, sf_dir)
    fct = ctx.ref("fct_orders")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/fct_orders_by_month"
        write_partitioned(fct, path, "order_month", source_col="order_date")
        back = read_partitioned(spark, path)
        one_month = back.filter(F.col("order_month") == "1998-01")
        plan = _physical_plan(one_month)
        # the partition predicate must appear as a partition filter on the
        # scan, not a post-scan Filter
        assert "PartitionFilters" in plan and "1998-01" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
        n_total = back.count()
        n_month = one_month.count()
        assert 0 < n_month < n_total


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        ctx = Context(spark, sf_dir)
        orders = ctx.ref("ods_orders")
        items = ctx.ref("orders_items").select(
            "order_key", "quantity", "gross_item_sales_amount"
        )
        write_bucketed(orders, spark, "b_orders", "order_key", 8)
        write_bucketed(items, spark, "b_items", "order_key", 8)
        j = spark.table("b_orders").join(spark.table("b_items"), "order_key")
        plan = _physical_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_build_warehouse_concurrent(spark, sf_dir, tmp_path):
    from dbt_tpch_spark.warehouse import build_warehouse

    paths = build_warehouse(
        spark, sf_dir, str(tmp_path / "wh"), parallelism=4, layers=("ods", "wh")
    )
    # every table-model of those layers materialized
    assert {"ods_orders", "orders_items", "fct_orders", "fct_orders_items",
            "dim_customer", "dim_part", "dim_supplier",
            "rpt_pricing_summary"} <= set(paths)
    # artifacts equal the lazy computation
    ctx = Context(spark, sf_dir)
    lazy = {tuple(r) for r in ctx.ref("rpt_pricing_summary").collect()}
    built = {tuple(r) for r in spark.read.parquet(paths["rpt_pricing_summary"]).collect()}
    assert lazy == built


def test_write_incremental(spark, sf_dir, tmp_path):
    from dbt_tpch_spark.warehouse import write_incremental

    ctx = Context(spark, sf_dir)
    daily = ctx.ref("metrics_daily_revenue")
    cutoff = "1998-01-01"
    old = daily.filter(F.col("order_date") < cutoff)
    path = str(tmp_path / "daily")

    n1 = write_incremental(old, spark, path, "order_date")
    assert n1 == old.count() > 0
    # second run with the full frame appends only the new dates
    n2 = write_incremental(daily, spark, path, "order_date")
    assert n2 == daily.count() - old.count() > 0
    # incremental result == full rebuild
    final = {tuple(r) for r in spark.read.parquet(path).collect()}
    full = {tuple(r) for r in daily.collect()}
    assert final == full
    # idempotent third run
    assert write_incremental(daily, spark, path, "order_date") == 0


def test_merge_upsert(spark, sf_dir, tmp_path):
    from dbt_tpch_spark.warehouse import merge_upsert

    path = str(tmp_path / "state")
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, ver int"
    )
    r1 = merge_upsert(spark, path, base, ["k"])
    assert r1 == {"inserted": 3, "updated": 0}

    updates = spark.createDataFrame(
        [(2, "B", 2), (4, "d", 2)], "k int, v string, ver int"
    )
    r2 = merge_upsert(spark, path, updates, ["k"])
    assert r2 == {"inserted": 1, "updated": 1}
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}

    # versioned merge: replaying an OLD batch must not clobber newer rows
    stale = spark.createDataFrame([(2, "old", 1)], "k int, v string, ver int")
    merge_upsert(spark, path, stale, ["k"], version_col="ver")
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}

    # EQUAL-version collision: the update side must win deterministically
    # (replaying a corrected same-version batch converges on the new value)
    tie = spark.createDataFrame([(2, "B2", 2)], "k int, v string, ver int")
    merge_upsert(spark, path, tie, ["k"], version_col="ver")
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}
    # and replaying the same batch again is a no-op fixed point
    merge_upsert(spark, path, tie, ["k"], version_col="ver")
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}


def test_insert_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    """dbt insert_overwrite semantics: re-running a batch for one
    partition restates that partition and leaves the others byte-for-byte
    alone — a plain overwrite would truncate the whole table."""
    from dbt_tpch_spark.warehouse import write_insert_overwrite

    path = str(tmp_path / "fact")
    batch1 = spark.createDataFrame(
        [("2026-01", 1, 10.0), ("2026-01", 2, 20.0), ("2026-02", 3, 30.0)],
        "month string, id int, v double",
    )
    rep = write_insert_overwrite(batch1, spark, path, "month")
    assert rep["partitions_written"] == ["2026-01", "2026-02"]
    assert rep["rows_written"] == 3

    # restate Feb (different rows) and add Mar; Jan must be untouched
    batch2 = spark.createDataFrame(
        [("2026-02", 30, 300.0), ("2026-03", 4, 40.0)],
        "month string, id int, v double",
    )
    rep2 = write_insert_overwrite(batch2, spark, path, "month")
    assert rep2["partitions_written"] == ["2026-02", "2026-03"]

    got = {
        (r["month"], r["id"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2026-01", 1, 10.0),
        ("2026-01", 2, 20.0),
        ("2026-02", 30, 300.0),
        ("2026-03", 4, 40.0),
    }
    # conf restored to its prior value
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower()
        != "dynamic"
    )


def test_insert_overwrite_rejects_high_cardinality_partition_col(
    spark, tmp_path, monkeypatch
):
    """A high-cardinality partition column must fail loudly BEFORE the
    distinct-value collect lands unbounded rows on the driver (and before
    a million-directory partitionBy write)."""
    import pytest

    import dbt_tpch_spark.warehouse as wh

    monkeypatch.setattr(wh, "MAX_OVERWRITE_PARTITIONS", 5)
    df = spark.range(100).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="not a partition grain"):
        wh.write_insert_overwrite(df, spark, str(tmp_path / "t"), "k")
