"""Base layer: rename-projections of the raw TPC-H tables (ephemeral).

Reference: models/base/*.sql (all ``materialized='ephemeral'``,
dbt_project.yml:29-30). Columns absent from the driver test corpus
(TESTDATA.md / SURVEY.md §1.4: commit/receipt dates, ship mode, addresses,
phones, comments, partsupp entirely) are omitted on BOTH the Spark and the
oracle side, so parity is against the adapted schema.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.functions import money
from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.oracle import money_sql, oracle


@model("base_line_item", layer="base", materialization="ephemeral")
def base_line_item(ctx):
    """Reference: models/base/base_line_item.sql:6-24."""
    return ctx.source("lineitem").select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_partkey").alias("part_key"),
        F.col("l_suppkey").alias("supplier_key"),
        F.col("l_linenumber").alias("order_line_number"),
        F.col("l_quantity").alias("quantity"),
        money(F.col("l_extendedprice")).alias("extended_price"),
        money(F.col("l_discount")).alias("discount_percentage"),
        money(F.col("l_tax")).alias("tax_rate"),
        F.col("l_returnflag").alias("return_status_code"),
        F.col("l_linestatus").alias("order_line_status_code"),
        F.col("l_shipdate").alias("ship_date"),
    )


oracle(
    "base_line_item",
    ("lineitem",),
    f"""SELECT
    l_orderkey AS order_key,
    l_partkey AS part_key,
    l_suppkey AS supplier_key,
    l_linenumber AS order_line_number,
    l_quantity AS quantity,
    {money_sql('l_extendedprice')} AS extended_price,
    {money_sql('l_discount')} AS discount_percentage,
    {money_sql('l_tax')} AS tax_rate,
    l_returnflag AS return_status_code,
    l_linestatus AS order_line_status_code,
    l_shipdate AS ship_date
FROM lineitem""",
)


@model("base_orders", layer="base", materialization="ephemeral")
def base_orders(ctx):
    """Reference: models/base/base_orders.sql:6-15."""
    return ctx.source("orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("customer_key"),
        F.col("o_orderstatus").alias("order_status_code"),
        money(F.col("o_totalprice")).alias("order_amount"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderpriority").alias("order_priority_code"),
    )


oracle(
    "base_orders",
    ("orders",),
    f"""SELECT
    o_orderkey AS order_key,
    o_custkey AS customer_key,
    o_orderstatus AS order_status_code,
    {money_sql('o_totalprice')} AS order_amount,
    o_orderdate AS order_date,
    o_orderpriority AS order_priority_code
FROM orders""",
)


@model("base_customer", layer="base", materialization="ephemeral")
def base_customer(ctx):
    """Reference: models/base/base_customer.sql:6-14."""
    return ctx.source("customer").select(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_name").alias("customer_name"),
        F.col("c_nationkey").alias("nation_key"),
        money(F.col("c_acctbal")).alias("customer_account_balance"),
        F.col("c_mktsegment").alias("customer_market_segment_name"),
    )


oracle(
    "base_customer",
    ("customer",),
    f"""SELECT
    c_custkey AS customer_key,
    c_name AS customer_name,
    c_nationkey AS nation_key,
    {money_sql('c_acctbal')} AS customer_account_balance,
    c_mktsegment AS customer_market_segment_name
FROM customer""",
)


@model("base_part", layer="base", materialization="ephemeral")
def base_part(ctx):
    """Reference: models/base/base_part.sql:6-15 (no money cast on price)."""
    return ctx.source("part").select(
        F.col("p_partkey").alias("part_key"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("part_brand_name"),
        F.col("p_type").alias("part_type_name"),
        F.col("p_size").alias("part_size"),
        F.col("p_retailprice").alias("retail_price"),
    )


oracle(
    "base_part",
    ("part",),
    """SELECT
    p_partkey AS part_key,
    p_name AS part_name,
    p_brand AS part_brand_name,
    p_type AS part_type_name,
    p_size AS part_size,
    p_retailprice AS retail_price
FROM part""",
)


@model("base_supplier", layer="base", materialization="ephemeral")
def base_supplier(ctx):
    """Reference: models/base/base_supplier.sql:6-13."""
    return ctx.source("supplier").select(
        F.col("s_suppkey").alias("supplier_key"),
        F.col("s_name").alias("supplier_name"),
        F.col("s_nationkey").alias("nation_key"),
        money(F.col("s_acctbal")).alias("supplier_account_balance"),
    )


oracle(
    "base_supplier",
    ("supplier",),
    f"""SELECT
    s_suppkey AS supplier_key,
    s_name AS supplier_name,
    s_nationkey AS nation_key,
    {money_sql('s_acctbal')} AS supplier_account_balance
FROM supplier""",
)


@model("base_nation", layer="base", materialization="ephemeral")
def base_nation(ctx):
    """Reference: models/base/base_nation.sql:6-10."""
    return ctx.source("nation").select(
        F.col("n_nationkey").alias("nation_key"),
        F.col("n_name").alias("nation_name"),
        F.col("n_regionkey").alias("region_key"),
    )


oracle(
    "base_nation",
    ("nation",),
    """SELECT
    n_nationkey AS nation_key,
    n_name AS nation_name,
    n_regionkey AS region_key
FROM nation""",
)


@model("base_region", layer="base", materialization="ephemeral")
def base_region(ctx):
    """Reference: models/base/base_region.sql:6-9."""
    return ctx.source("region").select(
        F.col("r_regionkey").alias("region_key"),
        F.col("r_name").alias("region_name"),
    )


oracle(
    "base_region",
    ("region",),
    """SELECT
    r_regionkey AS region_key,
    r_name AS region_name
FROM region""",
)
