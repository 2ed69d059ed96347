"""Reports layer, part 1 (reference: models/reports/*.sql, materialized=
'table', dbt_project.yml:39-40). Corpus-runnable subset.

Determinism addenda (SURVEY §4.3, applied to BOTH the Spark model and its
oracle SQL, since we control both sides):

* every ranking/ntile/lag window gets an explicit unique tie-break key —
  cross-engine tie resolution is otherwise arbitrary;
* running/whole-table window sums of doubles accumulate in exact decimal
  (``dsum_over``/``wsum_sql``) — FP accumulation order inside a frame is an
  engine-internal detail;
* running-sum frames are explicit ROWS (DuckDB/Spark default to RANGE,
  which groups peers on ties).

Whole-table windows (``over ()``) appear only over already-aggregated,
report-cardinality inputs; at 100 TB grain they would be rewritten as scalar
agg + broadcast (engine note in SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_tpch_spark.functions import (
    bucketed_windows,
    davg,
    days_between,
    dsum,
    dsum_over,
    global_ntile,
    isum,
    month_of,
    rnd,
)
from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.oracle import (
    davg_sql,
    days_between_sql,
    dsum_sql,
    isum_sql,
    month_sql,
    oracle,
    rnd_sql,
    wsum_sql,
)

_ROWS_ALL = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"


@model("customer_concentration_risk", layer="reports", materialization="table")
def customer_concentration_risk(ctx):
    """Pareto analysis of customer revenue. Reference:
    models/reports/customer_concentration_risk.sql:1-46."""
    o = ctx.ref("fct_orders")
    c = ctx.ref("dim_customer")
    rev = (
        o.join(
            F.broadcast(
                c.select(
                    "customer_key",
                    "customer_name",
                    "customer_nation_name",
                    "customer_market_segment_name",
                )
            ),
            "customer_key",
        )
        .groupBy(
            "customer_key",
            "customer_name",
            "customer_nation_name",
            "customer_market_segment_name",
        )
        .agg(
            dsum(F.col("gross_item_sales_amount")).alias("total_revenue"),
            # round-11: fct_orders is order-grain (order_key unique per
            # row), so plain count == COUNT(DISTINCT order_key) — the agg
            # plans single-phase with no distinct machinery
            F.count(F.lit(1)).alias("order_count"),
        )
    )
    # Scale: the per-customer frame grows linearly with SF, so the rank /
    # running-sum / grand-total window stack runs bucketed (exact ranks and
    # exact-decimal sums lifted via a <=32-row broadcast offset frame)
    # instead of through one unpartitioned WindowExec task.
    ranked = bucketed_windows(
        rev,
        "total_revenue",
        ["customer_key"],
        ascending=False,
        rank_out="revenue_rank",
        running_sum=("total_revenue", "cumulative_revenue"),
        grand_sum=("total_revenue", "grand_total_revenue"),
        count_out="total_customers",
    )
    share = F.col("cumulative_revenue") / F.col("grand_total_revenue")
    return ranked.select(
        "revenue_rank",
        "customer_key",
        "customer_name",
        "customer_nation_name",
        "customer_market_segment_name",
        "order_count",
        "total_revenue",
        "cumulative_revenue",
        "grand_total_revenue",
        rnd(F.col("total_revenue") / F.col("grand_total_revenue") * 100, 4).alias(
            "pct_of_total_revenue"
        ),
        rnd(share * 100, 2).alias("cumulative_pct"),
        rnd(
            F.col("revenue_rank").cast("double") / F.col("total_customers") * 100, 2
        ).alias("customer_percentile"),
        F.when(share <= 0.80, "top_80_pct")
        .when(share <= 0.95, "middle_15_pct")
        .otherwise("bottom_5_pct")
        .alias("pareto_tier"),
    )


_CCR_ORDER = "ORDER BY total_revenue DESC, customer_key"
oracle(
    "customer_concentration_risk",
    ("fct_orders", "dim_customer"),
    f"""WITH customer_revenue AS (
    SELECT
        o.customer_key,
        c.customer_name,
        c.customer_nation_name,
        c.customer_market_segment_name,
        {dsum_sql('o.gross_item_sales_amount')} AS total_revenue,
        COUNT(DISTINCT o.order_key) AS order_count
    FROM fct_orders o
    JOIN dim_customer c ON o.customer_key = c.customer_key
    GROUP BY 1, 2, 3, 4
),
ranked AS (
    SELECT
        *,
        CAST(ROW_NUMBER() OVER ({_CCR_ORDER}) AS BIGINT) AS revenue_rank,
        COUNT(*) OVER () AS total_customers,
        {wsum_sql('total_revenue', '')} AS grand_total_revenue,
        {wsum_sql('total_revenue', f'{_CCR_ORDER} {_ROWS_ALL}')} AS cumulative_revenue
    FROM customer_revenue
)
SELECT
    revenue_rank,
    customer_key,
    customer_name,
    customer_nation_name,
    customer_market_segment_name,
    order_count,
    total_revenue,
    cumulative_revenue,
    grand_total_revenue,
    {rnd_sql('total_revenue / grand_total_revenue * 100', 4)} AS pct_of_total_revenue,
    {rnd_sql('cumulative_revenue / grand_total_revenue * 100', 2)} AS cumulative_pct,
    {rnd_sql('CAST(revenue_rank AS DOUBLE) / total_customers * 100', 2)} AS customer_percentile,
    CASE
        WHEN cumulative_revenue / grand_total_revenue <= 0.80 THEN 'top_80_pct'
        WHEN cumulative_revenue / grand_total_revenue <= 0.95 THEN 'middle_15_pct'
        ELSE 'bottom_5_pct'
    END AS pareto_tier
FROM ranked""",
)


@model("repeat_purchase_analysis", layer="reports", materialization="table")
def repeat_purchase_analysis(ctx):
    """Repeat purchase behavior by order sequence. Reference:
    models/reports/repeat_purchase_analysis.sql:1-33."""
    o = ctx.ref("fct_orders")
    w = Window.partitionBy("customer_key").orderBy("order_date", "order_key")
    seq = o.select(
        "customer_key",
        "order_key",
        "order_date",
        "gross_item_sales_amount",
        F.row_number().over(w).cast("long").alias("order_sequence"),
        F.lag("order_date").over(w).alias("prev_order_date"),
    ).withColumn(
        "days_since_prev_order",
        days_between(F.col("order_date"), F.col("prev_order_date")),
    )
    return seq.groupBy("order_sequence").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.countDistinct("customer_key").alias("customer_count"),
        rnd(davg(F.col("gross_item_sales_amount")), 2).alias("avg_order_value"),
        rnd(F.avg("days_since_prev_order"), 1).alias("avg_days_since_prev"),
        isum(F.when(F.col("days_since_prev_order") <= 30, 1).otherwise(0)).alias(
            "repeat_within_30d"
        ),
        isum(F.when(F.col("days_since_prev_order") <= 60, 1).otherwise(0)).alias(
            "repeat_within_60d"
        ),
        isum(F.when(F.col("days_since_prev_order") <= 90, 1).otherwise(0)).alias(
            "repeat_within_90d"
        ),
    )


oracle(
    "repeat_purchase_analysis",
    ("fct_orders",),
    f"""WITH sequenced_orders AS (
    SELECT
        customer_key,
        order_key,
        order_date,
        gross_item_sales_amount,
        CAST(ROW_NUMBER() OVER (PARTITION BY customer_key ORDER BY order_date, order_key) AS BIGINT) AS order_sequence,
        LAG(order_date) OVER (PARTITION BY customer_key ORDER BY order_date, order_key) AS prev_order_date
    FROM fct_orders
),
with_gaps AS (
    SELECT *, {days_between_sql('order_date', 'prev_order_date')} AS days_since_prev_order
    FROM sequenced_orders
)
SELECT
    order_sequence,
    COUNT(*) AS order_count,
    COUNT(DISTINCT customer_key) AS customer_count,
    {rnd_sql(davg_sql('gross_item_sales_amount'), 2)} AS avg_order_value,
    {rnd_sql('AVG(days_since_prev_order)', 1)} AS avg_days_since_prev,
    {isum_sql('CASE WHEN days_since_prev_order <= 30 THEN 1 ELSE 0 END')} AS repeat_within_30d,
    {isum_sql('CASE WHEN days_since_prev_order <= 60 THEN 1 ELSE 0 END')} AS repeat_within_60d,
    {isum_sql('CASE WHEN days_since_prev_order <= 90 THEN 1 ELSE 0 END')} AS repeat_within_90d
FROM with_gaps
GROUP BY 1""",
)


@model("regional_trade_balance", layer="reports", materialization="table")
def regional_trade_balance(ctx):
    """Import/export balance by nation via two chained FULL OUTER joins.
    Reference: models/reports/regional_trade_balance.sql:1-74."""
    i = ctx.ref("fct_orders_items")
    s = ctx.ref("dim_supplier")
    c = ctx.ref("dim_customer")
    flows = (
        i.join(
            F.broadcast(s.select("supplier_key", "supplier_nation_name", "supplier_region_name")),
            "supplier_key",
        )
        .join(
            F.broadcast(c.select("customer_key", "customer_nation_name", "customer_region_name")),
            "customer_key",
        )
        .groupBy(
            F.col("supplier_nation_name").alias("exporter_nation"),
            F.col("supplier_region_name").alias("exporter_region"),
            F.col("customer_nation_name").alias("importer_nation"),
            F.col("customer_region_name").alias("importer_region"),
        )
        .agg(
            dsum(F.col("gross_item_sales_amount")).alias("trade_value"),
            dsum(F.col("quantity")).alias("trade_volume"),
            F.countDistinct("order_key").alias("order_count"),
        )
    )
    cross = flows.filter(F.col("exporter_nation") != F.col("importer_nation"))
    exports = cross.groupBy(
        F.col("exporter_nation").alias("nation_e"),
        F.col("exporter_region").alias("region_e"),
    ).agg(
        dsum(F.col("trade_value")).alias("export_value"),
        dsum(F.col("trade_volume")).alias("export_volume"),
    )
    imports = cross.groupBy(
        F.col("importer_nation").alias("nation_i"),
        F.col("importer_region").alias("region_i"),
    ).agg(
        dsum(F.col("trade_value")).alias("import_value"),
        dsum(F.col("trade_volume")).alias("import_volume"),
    )
    domestic = (
        flows.filter(F.col("exporter_nation") == F.col("importer_nation"))
        .groupBy(
            F.col("exporter_nation").alias("nation_d"),
            F.col("exporter_region").alias("region_d"),
        )
        .agg(
            dsum(F.col("trade_value")).alias("domestic_value"),
            dsum(F.col("trade_volume")).alias("domestic_volume"),
        )
    )
    joined = exports.join(
        imports, F.col("nation_e") == F.col("nation_i"), "full"
    ).join(
        domestic,
        F.coalesce(F.col("nation_e"), F.col("nation_i")) == F.col("nation_d"),
        "full",
    )
    ev = F.coalesce(F.col("export_value"), F.lit(0.0))
    iv = F.coalesce(F.col("import_value"), F.lit(0.0))
    dv = F.coalesce(F.col("domestic_value"), F.lit(0.0))
    return joined.select(
        F.coalesce(F.col("nation_e"), F.col("nation_i"), F.col("nation_d")).alias(
            "nation"
        ),
        F.coalesce(F.col("region_e"), F.col("region_i"), F.col("region_d")).alias(
            "region"
        ),
        ev.alias("export_value"),
        iv.alias("import_value"),
        dv.alias("domestic_value"),
        (ev - iv).alias("trade_balance"),
        F.coalesce(F.col("export_volume"), F.lit(0.0)).alias("export_volume"),
        F.coalesce(F.col("import_volume"), F.lit(0.0)).alias("import_volume"),
        F.coalesce(F.col("domestic_volume"), F.lit(0.0)).alias("domestic_volume"),
        rnd(dv * 100.0 / F.nullif(ev + iv + dv, F.lit(0.0)), 2).alias(
            "domestic_share_pct"
        ),
        F.when(ev > iv, "surplus").when(ev < iv, "deficit").otherwise("balanced").alias(
            "trade_position"
        ),
    )


oracle(
    "regional_trade_balance",
    ("fct_orders_items", "dim_supplier", "dim_customer"),
    f"""WITH flows AS (
    SELECT
        s.supplier_nation_name AS exporter_nation,
        s.supplier_region_name AS exporter_region,
        c.customer_nation_name AS importer_nation,
        c.customer_region_name AS importer_region,
        {dsum_sql('i.gross_item_sales_amount')} AS trade_value,
        {dsum_sql('i.quantity')} AS trade_volume,
        COUNT(DISTINCT i.order_key) AS order_count
    FROM fct_orders_items i
    JOIN dim_supplier s ON i.supplier_key = s.supplier_key
    JOIN dim_customer c ON i.customer_key = c.customer_key
    GROUP BY 1, 2, 3, 4
),
exports AS (
    SELECT exporter_nation AS nation_e, exporter_region AS region_e,
        {dsum_sql('trade_value')} AS export_value,
        {dsum_sql('trade_volume')} AS export_volume
    FROM flows WHERE exporter_nation != importer_nation
    GROUP BY 1, 2
),
imports AS (
    SELECT importer_nation AS nation_i, importer_region AS region_i,
        {dsum_sql('trade_value')} AS import_value,
        {dsum_sql('trade_volume')} AS import_volume
    FROM flows WHERE exporter_nation != importer_nation
    GROUP BY 1, 2
),
domestic AS (
    SELECT exporter_nation AS nation_d, exporter_region AS region_d,
        {dsum_sql('trade_value')} AS domestic_value,
        {dsum_sql('trade_volume')} AS domestic_volume
    FROM flows WHERE exporter_nation = importer_nation
    GROUP BY 1, 2
)
SELECT
    COALESCE(e.nation_e, i.nation_i, d.nation_d) AS nation,
    COALESCE(e.region_e, i.region_i, d.region_d) AS region,
    COALESCE(e.export_value, 0.0) AS export_value,
    COALESCE(i.import_value, 0.0) AS import_value,
    COALESCE(d.domestic_value, 0.0) AS domestic_value,
    COALESCE(e.export_value, 0.0) - COALESCE(i.import_value, 0.0) AS trade_balance,
    COALESCE(e.export_volume, 0.0) AS export_volume,
    COALESCE(i.import_volume, 0.0) AS import_volume,
    COALESCE(d.domestic_volume, 0.0) AS domestic_volume,
    {rnd_sql('COALESCE(d.domestic_value, 0.0) * 100.0 / NULLIF(COALESCE(e.export_value, 0.0) + COALESCE(i.import_value, 0.0) + COALESCE(d.domestic_value, 0.0), 0.0)', 2)} AS domestic_share_pct,
    CASE
        WHEN COALESCE(e.export_value, 0.0) > COALESCE(i.import_value, 0.0) THEN 'surplus'
        WHEN COALESCE(e.export_value, 0.0) < COALESCE(i.import_value, 0.0) THEN 'deficit'
        ELSE 'balanced'
    END AS trade_position
FROM exports e
FULL OUTER JOIN imports i ON e.nation_e = i.nation_i
FULL OUTER JOIN domestic d ON COALESCE(e.nation_e, i.nation_i) = d.nation_d""",
)


@model("discount_effectiveness", layer="reports", materialization="table")
def discount_effectiveness(ctx):
    """Discounted vs full-price order behavior. Reference:
    models/reports/discount_effectiveness.sql:1-46."""
    items = ctx.ref("fct_orders_items").select(
        "order_key",
        "customer_key",
        "order_date",
        (F.col("discount_percentage") > 0).alias("is_discounted"),
        "quantity",
        "gross_item_sales_amount",
        "item_discount_amount",
    )
    order_level = items.groupBy("order_key", "customer_key", "order_date").agg(
        isum(F.when(F.col("is_discounted"), 1).otherwise(0)).alias("discounted_lines"),
        isum(F.when(~F.col("is_discounted"), 1).otherwise(0)).alias(
            "full_price_lines"
        ),
        dsum(F.col("quantity")).alias("total_quantity"),
        dsum(F.col("gross_item_sales_amount")).alias("gross_revenue"),
        dsum(F.abs(F.col("item_discount_amount"))).alias("discount_amount"),
    )
    order_level = order_level.withColumn(
        "order_discount_type",
        F.when(F.col("discounted_lines") == 0, "all_full_price")
        .when(F.col("full_price_lines") == 0, "all_discounted")
        .otherwise("mixed"),
    )
    return order_level.groupBy("order_discount_type").agg(
        F.countDistinct("order_key").alias("order_count"),
        F.countDistinct("customer_key").alias("customer_count"),
        rnd(davg(F.col("total_quantity")), 2).alias("avg_items_per_order"),
        rnd(davg(F.col("gross_revenue")), 2).alias("avg_order_value"),
        dsum(F.col("gross_revenue")).alias("total_revenue"),
        dsum(F.col("discount_amount")).alias("total_discount_given"),
        rnd(
            dsum(F.col("discount_amount"))
            / F.nullif(dsum(F.col("gross_revenue")), F.lit(0.0))
            * 100,
            2,
        ).alias("effective_discount_rate"),
    )


oracle(
    "discount_effectiveness",
    ("fct_orders_items",),
    f"""WITH items AS (
    SELECT
        order_key,
        customer_key,
        order_date,
        (discount_percentage > 0) AS is_discounted,
        quantity,
        gross_item_sales_amount,
        item_discount_amount
    FROM fct_orders_items
),
order_level AS (
    SELECT
        order_key,
        customer_key,
        order_date,
        {isum_sql('CASE WHEN is_discounted THEN 1 ELSE 0 END')} AS discounted_lines,
        {isum_sql('CASE WHEN NOT is_discounted THEN 1 ELSE 0 END')} AS full_price_lines,
        CASE
            WHEN {isum_sql('CASE WHEN is_discounted THEN 1 ELSE 0 END')} = 0 THEN 'all_full_price'
            WHEN {isum_sql('CASE WHEN NOT is_discounted THEN 1 ELSE 0 END')} = 0 THEN 'all_discounted'
            ELSE 'mixed'
        END AS order_discount_type,
        {dsum_sql('quantity')} AS total_quantity,
        {dsum_sql('gross_item_sales_amount')} AS gross_revenue,
        {dsum_sql('ABS(item_discount_amount)')} AS discount_amount
    FROM items
    GROUP BY 1, 2, 3
)
SELECT
    order_discount_type,
    COUNT(DISTINCT order_key) AS order_count,
    COUNT(DISTINCT customer_key) AS customer_count,
    {rnd_sql(davg_sql('total_quantity'), 2)} AS avg_items_per_order,
    {rnd_sql(davg_sql('gross_revenue'), 2)} AS avg_order_value,
    {dsum_sql('gross_revenue')} AS total_revenue,
    {dsum_sql('discount_amount')} AS total_discount_given,
    {rnd_sql(f"{dsum_sql('discount_amount')} / NULLIF({dsum_sql('gross_revenue')}, 0.0) * 100", 2)} AS effective_discount_rate
FROM order_level
GROUP BY 1""",
)


@model("customer_geographic_summary", layer="reports", materialization="table")
def customer_geographic_summary(ctx):
    """Customer metrics by nation/region. Reference:
    models/reports/customer_geographic_summary.sql:1-26."""
    c = ctx.ref("dim_customer")
    o = ctx.ref("fct_orders")
    return (
        c.join(o, "customer_key", "left")
        .groupBy(
            F.col("customer_region_name").alias("region_name"),
            F.col("customer_nation_name").alias("nation_name"),
        )
        .agg(
            F.countDistinct("customer_key").alias("customer_count"),
            F.countDistinct("order_key").alias("order_count"),
            dsum(F.col("gross_item_sales_amount")).alias("total_revenue"),
            dsum(F.col("net_item_sales_amount")).alias("total_net_revenue"),
            rnd(davg(F.col("gross_item_sales_amount")), 2).alias("avg_order_value"),
            rnd(
                dsum(F.col("gross_item_sales_amount"))
                / F.nullif(F.countDistinct("customer_key"), F.lit(0)),
                2,
            ).alias("revenue_per_customer"),
            rnd(
                F.countDistinct("order_key").cast("double")
                / F.nullif(F.countDistinct("customer_key"), F.lit(0)),
                2,
            ).alias("orders_per_customer"),
            dsum(F.col("customer_account_balance")).alias("total_account_balance"),
        )
    )


oracle(
    "customer_geographic_summary",
    ("dim_customer", "fct_orders"),
    f"""SELECT
    c.customer_region_name AS region_name,
    c.customer_nation_name AS nation_name,
    COUNT(DISTINCT c.customer_key) AS customer_count,
    COUNT(DISTINCT o.order_key) AS order_count,
    {dsum_sql('o.gross_item_sales_amount')} AS total_revenue,
    {dsum_sql('o.net_item_sales_amount')} AS total_net_revenue,
    {rnd_sql(davg_sql('o.gross_item_sales_amount'), 2)} AS avg_order_value,
    {rnd_sql(f"{dsum_sql('o.gross_item_sales_amount')} / NULLIF(COUNT(DISTINCT c.customer_key), 0)", 2)} AS revenue_per_customer,
    {rnd_sql('CAST(COUNT(DISTINCT o.order_key) AS DOUBLE) / NULLIF(COUNT(DISTINCT c.customer_key), 0)', 2)} AS orders_per_customer,
    {dsum_sql('c.customer_account_balance')} AS total_account_balance
FROM dim_customer c
LEFT JOIN fct_orders o ON c.customer_key = o.customer_key
GROUP BY 1, 2""",
)


@model("part_sales_velocity", layer="reports", materialization="table")
def part_sales_velocity(ctx):
    """Fast/slow mover classification via ntile quartiles. Reference:
    models/reports/part_sales_velocity.sql:1-44. Tie-break addendum:
    ntile ordering extended with part_key (ties are common in unit counts).
    """
    i = ctx.ref("fct_orders_items")
    p = ctx.ref("dim_part")
    monthly = i.groupBy(
        "part_key", month_of(F.col("order_date")).alias("order_month")
    ).agg(
        dsum(F.col("quantity")).alias("monthly_units"),
        dsum(F.col("gross_item_sales_amount")).alias("monthly_revenue"),
    )
    stats = monthly.groupBy("part_key").agg(
        F.countDistinct("order_month").alias("active_months"),
        dsum(F.col("monthly_units")).alias("total_units"),
        dsum(F.col("monthly_revenue")).alias("total_revenue"),
        davg(F.col("monthly_units")).alias("avg_monthly_units"),
        davg(F.col("monthly_revenue")).alias("avg_monthly_revenue"),
    )
    # Scale: part-grain frame (SF-linear) — exact global NTILE via bucketed
    # ranks, not an unpartitioned ntile() window.
    with_nt = global_ntile(
        stats, 4, "avg_monthly_units", ["part_key"], "velocity_quartile"
    ).join(
        F.broadcast(p.select("part_key", "part_name", "part_type_name", "part_brand_name")),
        "part_key",
    )
    return with_nt.select(
        "part_key",
        "part_name",
        "part_type_name",
        "part_brand_name",
        "active_months",
        "total_units",
        "total_revenue",
        rnd(F.col("avg_monthly_units"), 2).alias("avg_monthly_units"),
        rnd(F.col("avg_monthly_revenue"), 2).alias("avg_monthly_revenue"),
        "velocity_quartile",
        F.when(F.col("velocity_quartile") == 4, "fast_mover")
        .when(F.col("velocity_quartile") == 3, "moderate")
        .when(F.col("velocity_quartile") == 2, "slow_mover")
        .otherwise("very_slow")
        .alias("velocity_category"),
    )


oracle(
    "part_sales_velocity",
    ("fct_orders_items", "dim_part"),
    f"""WITH part_monthly AS (
    SELECT
        i.part_key,
        {month_sql('i.order_date')} AS order_month,
        {dsum_sql('i.quantity')} AS monthly_units,
        {dsum_sql('i.gross_item_sales_amount')} AS monthly_revenue
    FROM fct_orders_items i
    GROUP BY 1, 2
),
part_stats AS (
    SELECT
        part_key,
        COUNT(DISTINCT order_month) AS active_months,
        {dsum_sql('monthly_units')} AS total_units,
        {dsum_sql('monthly_revenue')} AS total_revenue,
        {davg_sql('monthly_units')} AS avg_monthly_units,
        {davg_sql('monthly_revenue')} AS avg_monthly_revenue
    FROM part_monthly
    GROUP BY 1
),
with_nt AS (
    SELECT
        ps.part_key,
        p.part_name,
        p.part_type_name,
        p.part_brand_name,
        ps.active_months,
        ps.total_units,
        ps.total_revenue,
        ps.avg_monthly_units,
        ps.avg_monthly_revenue,
        CAST(NTILE(4) OVER (ORDER BY ps.avg_monthly_units, ps.part_key) AS BIGINT) AS velocity_quartile
    FROM part_stats ps
    JOIN dim_part p ON ps.part_key = p.part_key
)
SELECT
    part_key,
    part_name,
    part_type_name,
    part_brand_name,
    active_months,
    total_units,
    total_revenue,
    {rnd_sql('avg_monthly_units', 2)} AS avg_monthly_units,
    {rnd_sql('avg_monthly_revenue', 2)} AS avg_monthly_revenue,
    velocity_quartile,
    CASE
        WHEN velocity_quartile = 4 THEN 'fast_mover'
        WHEN velocity_quartile = 3 THEN 'moderate'
        WHEN velocity_quartile = 2 THEN 'slow_mover'
        ELSE 'very_slow'
    END AS velocity_category
FROM with_nt""",
)


@model("supply_chain_network", layer="reports", materialization="table")
def supply_chain_network(ctx):
    """Supplier->part->customer trade edges. Reference:
    models/reports/supply_chain_network.sql:1-36."""
    i = ctx.ref("fct_orders_items")
    s = ctx.ref("dim_supplier")
    p = ctx.ref("dim_part")
    c = ctx.ref("dim_customer")
    edges = i.groupBy("supplier_key", "part_key", "customer_key").agg(
        F.count(F.lit(1)).alias("shipment_count"),
        dsum(F.col("quantity")).alias("total_quantity"),
        dsum(F.col("gross_item_sales_amount")).alias("total_revenue"),
    )
    return (
        edges.join(
            F.broadcast(
                s.select("supplier_key", "supplier_name", "supplier_nation_name", "supplier_region_name")
            ),
            "supplier_key",
        )
        .join(F.broadcast(p.select("part_key", "part_name", "part_type_name")), "part_key")
        .join(
            F.broadcast(
                c.select("customer_key", "customer_name", "customer_nation_name", "customer_region_name")
            ),
            "customer_key",
        )
        .select(
            "supplier_key",
            "supplier_name",
            F.col("supplier_nation_name").alias("supplier_nation"),
            "part_key",
            "part_name",
            "part_type_name",
            "customer_key",
            "customer_name",
            F.col("customer_nation_name").alias("customer_nation"),
            "shipment_count",
            "total_quantity",
            "total_revenue",
            F.when(
                F.col("supplier_nation_name") == F.col("customer_nation_name"),
                "domestic",
            )
            .when(
                F.col("supplier_region_name") == F.col("customer_region_name"),
                "intra_regional",
            )
            .otherwise("inter_regional")
            .alias("trade_type"),
        )
    )


oracle(
    "supply_chain_network",
    ("fct_orders_items", "dim_supplier", "dim_part", "dim_customer"),
    f"""WITH edges AS (
    SELECT
        i.supplier_key,
        i.part_key,
        i.customer_key,
        COUNT(*) AS shipment_count,
        {dsum_sql('i.quantity')} AS total_quantity,
        {dsum_sql('i.gross_item_sales_amount')} AS total_revenue
    FROM fct_orders_items i
    GROUP BY 1, 2, 3
)
SELECT
    e.supplier_key,
    s.supplier_name,
    s.supplier_nation_name AS supplier_nation,
    e.part_key,
    p.part_name,
    p.part_type_name,
    e.customer_key,
    c.customer_name,
    c.customer_nation_name AS customer_nation,
    e.shipment_count,
    e.total_quantity,
    e.total_revenue,
    CASE
        WHEN s.supplier_nation_name = c.customer_nation_name THEN 'domestic'
        WHEN s.supplier_region_name = c.customer_region_name THEN 'intra_regional'
        ELSE 'inter_regional'
    END AS trade_type
FROM edges e
JOIN dim_supplier s ON e.supplier_key = s.supplier_key
JOIN dim_part p ON e.part_key = p.part_key
JOIN dim_customer c ON e.customer_key = c.customer_key""",
)


@model("customer_cohort_retention", layer="reports", materialization="table")
def customer_cohort_retention(ctx):
    """Retention by first-purchase cohort. Reference:
    models/reports/customer_cohort_retention.sql:1-53."""
    o = ctx.ref("fct_orders")
    cohort = o.groupBy("customer_key").agg(
        month_of(F.min("order_date")).alias("cohort_month")
    )
    activity = o.select(
        "customer_key", month_of(F.col("order_date")).alias("activity_month")
    ).distinct()
    period = (
        (F.year("activity_month") - F.year("cohort_month")) * 12
        + F.month("activity_month")
        - F.month("cohort_month")
    ).cast("long")
    cohort_activity = (
        cohort.join(activity, "customer_key")
        .groupBy("cohort_month", "activity_month", period.alias("period_number"))
        .agg(F.countDistinct("customer_key").alias("active_customers"))
    )
    sizes = cohort.groupBy("cohort_month").agg(
        F.countDistinct("customer_key").alias("cohort_size")
    )
    return cohort_activity.join(sizes, "cohort_month").select(
        "cohort_month",
        "activity_month",
        "period_number",
        "cohort_size",
        "active_customers",
        rnd(
            F.col("active_customers").cast("double") / F.col("cohort_size") * 100, 2
        ).alias("retention_pct"),
    )


oracle(
    "customer_cohort_retention",
    ("fct_orders",),
    f"""WITH customer_cohort AS (
    SELECT customer_key, {month_sql('MIN(order_date)')} AS cohort_month
    FROM fct_orders
    GROUP BY 1
),
customer_activity AS (
    SELECT o.customer_key, {month_sql('o.order_date')} AS activity_month
    FROM fct_orders o
    GROUP BY 1, 2
),
cohort_activity AS (
    SELECT
        cc.cohort_month,
        ca.activity_month,
        CAST(
            (EXTRACT(year FROM ca.activity_month) - EXTRACT(year FROM cc.cohort_month)) * 12
            + EXTRACT(month FROM ca.activity_month) - EXTRACT(month FROM cc.cohort_month)
        AS BIGINT) AS period_number,
        COUNT(DISTINCT ca.customer_key) AS active_customers
    FROM customer_cohort cc
    JOIN customer_activity ca ON cc.customer_key = ca.customer_key
    GROUP BY 1, 2, 3
),
cohort_sizes AS (
    SELECT cohort_month, COUNT(DISTINCT customer_key) AS cohort_size
    FROM customer_cohort
    GROUP BY 1
)
SELECT
    ca.cohort_month,
    ca.activity_month,
    ca.period_number,
    cs.cohort_size,
    ca.active_customers,
    {rnd_sql('CAST(ca.active_customers AS DOUBLE) / cs.cohort_size * 100', 2)} AS retention_pct
FROM cohort_activity ca
JOIN cohort_sizes cs ON ca.cohort_month = cs.cohort_month""",
)


@model("part_abc_classification", layer="reports", materialization="table")
def part_abc_classification(ctx):
    """ABC inventory classification (Pareto over parts). Reference:
    models/reports/part_abc_classification.sql:1-46 (adapted: corpus has no
    p_mfgr, so part_manufacturer_name is omitted)."""
    i = ctx.ref("fct_orders_items")
    p = ctx.ref("dim_part")
    rev = (
        i.join(
            F.broadcast(
                p.select("part_key", "part_name", "part_type_name", "part_brand_name")
            ),
            "part_key",
        )
        .groupBy("part_key", "part_name", "part_type_name", "part_brand_name")
        .agg(
            dsum(F.col("gross_item_sales_amount")).alias("total_revenue"),
            dsum(F.col("quantity")).alias("total_quantity"),
            F.countDistinct("order_key").alias("order_count"),
        )
    )
    # Scale: part-grain frame (SF-linear) — bucketed exact rank/cumsum, not
    # an unpartitioned window (see customer_concentration_risk).
    ranked = bucketed_windows(
        rev,
        "total_revenue",
        ["part_key"],
        ascending=False,
        rank_out="revenue_rank",
        running_sum=("total_revenue", "running_total"),
        grand_sum=("total_revenue", "grand_total"),
    )
    share = F.col("running_total") / F.col("grand_total")
    return ranked.select(
        "revenue_rank",
        "part_key",
        "part_name",
        "part_type_name",
        "part_brand_name",
        "total_revenue",
        "total_quantity",
        "order_count",
        rnd(F.col("total_revenue") / F.col("grand_total") * 100, 4).alias(
            "pct_of_revenue"
        ),
        rnd(share * 100, 2).alias("cumulative_pct"),
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


_ABC_ORDER = "ORDER BY total_revenue DESC, part_key"
oracle(
    "part_abc_classification",
    ("fct_orders_items", "dim_part"),
    f"""WITH part_revenue AS (
    SELECT
        i.part_key,
        p.part_name,
        p.part_type_name,
        p.part_brand_name,
        {dsum_sql('i.gross_item_sales_amount')} AS total_revenue,
        {dsum_sql('i.quantity')} AS total_quantity,
        COUNT(DISTINCT i.order_key) AS order_count
    FROM fct_orders_items i
    JOIN dim_part p ON i.part_key = p.part_key
    GROUP BY 1, 2, 3, 4
),
ranked AS (
    SELECT
        *,
        {wsum_sql('total_revenue', '')} AS grand_total,
        {wsum_sql('total_revenue', f'{_ABC_ORDER} {_ROWS_ALL}')} AS running_total,
        CAST(ROW_NUMBER() OVER ({_ABC_ORDER}) AS BIGINT) AS revenue_rank
    FROM part_revenue
)
SELECT
    revenue_rank,
    part_key,
    part_name,
    part_type_name,
    part_brand_name,
    total_revenue,
    total_quantity,
    order_count,
    {rnd_sql('total_revenue / grand_total * 100', 4)} AS pct_of_revenue,
    {rnd_sql('running_total / grand_total * 100', 2)} AS cumulative_pct,
    CASE
        WHEN running_total / grand_total <= 0.80 THEN 'A'
        WHEN running_total / grand_total <= 0.95 THEN 'B'
        ELSE 'C'
    END AS abc_class
FROM ranked""",
)


# part 2 of the reports layer lives in reports2.py (kept separate for file
# size); importing it here keeps `models.load_all()` single-entry.
from dbt_tpch_spark.models import reports2  # noqa: E402,F401
