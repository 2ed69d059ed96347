"""Data-quality summary as a first-class query: the reference's declared
schema tests (SURVEY §5.1) computed in one pass and returned as rows, so the
DQ state of the warehouse is itself queryable (and oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.oracle import oracle


@model("dq_summary", layer="extended", materialization="view")
def dq_summary(ctx):
    """One row per declared check with its violation count: unique via
    group-by-having, not_null via filter-count, relationships via left-anti
    count, accepted_values via not-in filter-count (dbt's generated-SQL
    semantics, models/wh/fct_orders.yml:9-60)."""
    fo = ctx.ref("fct_orders")
    foi = ctx.ref("fct_orders_items")
    dc = ctx.ref("dim_customer")
    dp = ctx.ref("dim_part")
    ds = ctx.ref("dim_supplier")

    def unique_violations(df, col, model_name):
        return (
            df.groupBy(col)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(
                F.lit(model_name).alias("model"),
                F.lit("unique").alias("check"),
                F.lit(col).alias("column"),
                F.col("violations").cast("long").alias("violations"),
            )
        )

    def not_null_violations(df, col, model_name):
        return df.agg(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("violations")
        ).select(
            F.lit(model_name).alias("model"),
            F.lit("not_null").alias("check"),
            F.lit(col).alias("column"),
            "violations",
        )

    def fk_violations(child, col, parent, pcol, model_name):
        return (
            child.select(F.col(col).alias("k"))
            .filter(F.col("k").isNotNull())
            .join(parent.select(F.col(pcol).alias("k")).distinct(), "k", "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(
                F.lit(model_name).alias("model"),
                F.lit("relationships").alias("check"),
                F.lit(col).alias("column"),
                "violations",
            )
        )

    def accepted_values_violations(df, col, values, model_name):
        return (
            df.filter(F.col(col).isNotNull() & ~F.col(col).isin(values))
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(
                F.lit(model_name).alias("model"),
                F.lit("accepted_values").alias("check"),
                F.lit(col).alias("column"),
                "violations",
            )
        )

    parts = [
        unique_violations(fo, "order_key", "fct_orders"),
        not_null_violations(fo, "customer_key", "fct_orders"),
        fk_violations(fo, "customer_key", dc, "customer_key", "fct_orders"),
        accepted_values_violations(
            fo, "order_status_code", ["F", "O", "P"], "fct_orders"
        ),
        unique_violations(foi, "order_item_key", "fct_orders_items"),
        not_null_violations(foi, "ship_date", "fct_orders_items"),
        fk_violations(foi, "part_key", dp, "part_key", "fct_orders_items"),
        fk_violations(foi, "supplier_key", ds, "supplier_key", "fct_orders_items"),
        accepted_values_violations(
            foi, "return_status_code", ["A", "N", "R"], "fct_orders_items"
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


oracle(
    "dq_summary",
    ("fct_orders", "fct_orders_items", "dim_customer", "dim_part", "dim_supplier"),
    """SELECT 'fct_orders' AS model, 'unique' AS "check", 'order_key' AS "column",
       CAST((SELECT COUNT(*) FROM (SELECT order_key FROM fct_orders GROUP BY 1 HAVING COUNT(*) > 1)) AS BIGINT) AS violations
UNION ALL
SELECT 'fct_orders', 'not_null', 'customer_key',
       CAST((SELECT COALESCE(SUM(CASE WHEN customer_key IS NULL THEN 1 ELSE 0 END), 0) FROM fct_orders) AS BIGINT)
UNION ALL
SELECT 'fct_orders', 'relationships', 'customer_key',
       CAST((SELECT COUNT(*) FROM fct_orders o WHERE o.customer_key IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM dim_customer c WHERE c.customer_key = o.customer_key)) AS BIGINT)
UNION ALL
SELECT 'fct_orders', 'accepted_values', 'order_status_code',
       CAST((SELECT COUNT(*) FROM fct_orders WHERE order_status_code IS NOT NULL
             AND order_status_code NOT IN ('F', 'O', 'P')) AS BIGINT)
UNION ALL
SELECT 'fct_orders_items', 'unique', 'order_item_key',
       CAST((SELECT COUNT(*) FROM (SELECT order_item_key FROM fct_orders_items GROUP BY 1 HAVING COUNT(*) > 1)) AS BIGINT)
UNION ALL
SELECT 'fct_orders_items', 'not_null', 'ship_date',
       CAST((SELECT COALESCE(SUM(CASE WHEN ship_date IS NULL THEN 1 ELSE 0 END), 0) FROM fct_orders_items) AS BIGINT)
UNION ALL
SELECT 'fct_orders_items', 'relationships', 'part_key',
       CAST((SELECT COUNT(*) FROM fct_orders_items i WHERE i.part_key IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM dim_part p WHERE p.part_key = i.part_key)) AS BIGINT)
UNION ALL
SELECT 'fct_orders_items', 'relationships', 'supplier_key',
       CAST((SELECT COUNT(*) FROM fct_orders_items i WHERE i.supplier_key IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM dim_supplier s WHERE s.supplier_key = i.supplier_key)) AS BIGINT)
UNION ALL
SELECT 'fct_orders_items', 'accepted_values', 'return_status_code',
       CAST((SELECT COUNT(*) FROM fct_orders_items WHERE return_status_code IS NOT NULL
             AND return_status_code NOT IN ('A', 'N', 'R')) AS BIGINT)""",
)


# --------------------------------------------------------------------------
# Benford first-digit conformance
# --------------------------------------------------------------------------

import math

#: Benford expected first-digit frequencies log10(1 + 1/d), inlined as
#: identical literals on both engines
_BENFORD = {d: round(math.log10(1.0 + 1.0 / d), 10) for d in range(1, 10)}


@model("orders_benford_check", layer="extended", materialization="view")
def orders_benford_check(ctx):
    """Benford's-law conformance of order totals — the classic synthetic /
    fabricated-data screen: first significant digits of naturally-occurring
    amounts follow log10(1 + 1/d); per-digit observed vs expected shares
    plus the chi-square statistic (same value on every row, the
    report-level verdict).

    First digit extracted numerically (floor(x / 10^floor(log10 x))) —
    never via string formatting, which differs between engines. One
    aggregation + a 9-row self-enrichment; trivially scale-safe."""
    o = ctx.ref("ods_orders").filter(F.col("order_amount") > 0)
    digit = F.floor(
        F.col("order_amount")
        / F.pow(F.lit(10.0), F.floor(F.log10("order_amount")))
    ).cast("long")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    expected = F.create_map(
        *[x for d, p in _BENFORD.items() for x in (F.lit(d), F.lit(p))]
    )[F.col("digit").cast("int")]
    from dbt_tpch_spark.functions import rnd, with_global_aggs

    enriched = with_global_aggs(
        counts, {"n_total": F.sum("n").cast("long")}
    ).select(
        "digit",
        F.col("n").cast("long").alias("n_orders"),
        rnd(F.col("n") / F.col("n_total"), 6).alias("observed_frac"),
        F.col("n_total"),
        expected.alias("benford_frac"),
    )
    chi = with_global_aggs(
        enriched,
        {
            "chi_square": rnd(
                F.sum(
                    F.pow(
                        F.col("n_orders") / F.col("n_total")
                        - F.col("benford_frac"),
                        F.lit(2.0),
                    )
                    / F.col("benford_frac")
                    * F.col("n_total")
                ),
                6,
            )
        },
    )
    return chi.select(
        "digit", "n_orders", "observed_frac", "benford_frac", "chi_square"
    )


def _benford_case() -> str:
    cases = " ".join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD.items())
    return f"CASE CAST(digit AS INTEGER) {cases} END"


oracle(
    "orders_benford_check",
    ("ods_orders",),
    f"""WITH digits AS (
    SELECT CAST(FLOOR(order_amount / POWER(10.0, FLOOR(LOG10(order_amount))))
                AS BIGINT) AS digit
    FROM ods_orders WHERE order_amount > 0
),
counts AS (
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders FROM digits GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM counts),
enriched AS (
    SELECT c.digit, c.n_orders,
           (FLOOR(c.n_orders / CAST(t.n_total AS DOUBLE) * 1000000.0 + 0.5)
            / 1000000.0) AS observed_frac,
           t.n_total,
           {_benford_case()} AS benford_frac
    FROM counts c CROSS JOIN tot t
),
chi AS (
    SELECT (FLOOR(SUM(POWER(n_orders / CAST(n_total AS DOUBLE) - benford_frac,
                            2.0) / benford_frac * n_total)
                  * 1000000.0 + 0.5) / 1000000.0) AS chi_square
    FROM enriched
)
SELECT e.digit, e.n_orders, e.observed_frac, e.benford_frac, c.chi_square
FROM enriched e CROSS JOIN chi c""",
)
