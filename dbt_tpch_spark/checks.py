"""Data-quality checks: the engine port of the reference's declarative
schema tests (SURVEY §5.1) — dbt's ``unique`` / ``not_null`` /
``relationships`` generated probes (models/wh/fct_orders.yml:9-60,
models/wh/fct_orders_items.yml:9-144).

Each check is a cheap DataFrame probe returning the count of violating rows
(pass == 0, exactly dbt's contract). ``run_reference_checks`` evaluates the
same suite the reference declares, adapted to the corpus schema.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclasses.dataclass(frozen=True)
class CheckResult:
    model: str
    check: str
    column: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def check_unique(df: DataFrame, column: str) -> int:
    """dbt `unique`: SELECT key ... GROUP BY key HAVING count(*) > 1."""
    return (
        df.groupBy(column).count().filter(F.col("count") > 1).limit(1).count()
    )


def check_not_null(df: DataFrame, column: str) -> int:
    """dbt `not_null`: SELECT * WHERE col IS NULL."""
    return df.filter(F.col(column).isNull()).limit(1).count()


def check_relationships(child: DataFrame, column: str, parent: DataFrame, parent_column: str) -> int:
    """dbt `relationships`: child keys LEFT ANTI JOIN parent keys — the only
    (implicit) anti-join in the reference project."""
    return (
        child.select(F.col(column).alias("k"))
        .filter(F.col("k").isNotNull())
        .join(
            parent.select(F.col(parent_column).alias("k")).distinct(),
            "k",
            "left_anti",
        )
        .limit(1)
        .count()
    )


def check_accepted_values(df: DataFrame, column: str, values: list) -> int:
    """dbt `accepted_values`: SELECT col ... WHERE col NOT IN (values).
    The reference declares only the other three families; provided for the
    complete dbt generic-test quartet (status/flag domains are the obvious
    targets: order_status_code in F/O/P, return flags in A/N/R)."""
    return (
        df.filter(F.col(column).isNotNull() & ~F.col(column).isin(values))
        .limit(1)
        .count()
    )


#: reference test suite adapted to corpus columns:
#: (model, check, column[, parent model, parent column])
REFERENCE_SUITE = (
    ("fct_orders", "unique", "order_key"),
    ("fct_orders", "not_null", "order_key"),
    ("fct_orders", "not_null", "order_date"),
    ("fct_orders", "not_null", "customer_key"),
    ("fct_orders", "not_null", "order_status_code"),
    ("fct_orders", "not_null", "gross_item_sales_amount"),
    ("fct_orders", "not_null", "net_item_sales_amount"),
    ("fct_orders", "relationships", "customer_key", "dim_customer", "customer_key"),
    ("fct_orders_items", "unique", "order_item_key"),
    ("fct_orders_items", "not_null", "order_item_key"),
    ("fct_orders_items", "not_null", "order_key"),
    ("fct_orders_items", "not_null", "part_key"),
    ("fct_orders_items", "not_null", "supplier_key"),
    ("fct_orders_items", "not_null", "ship_date"),
    ("fct_orders_items", "not_null", "quantity"),
    ("fct_orders_items", "not_null", "gross_item_sales_amount"),
    ("fct_orders_items", "relationships", "customer_key", "dim_customer", "customer_key"),
    ("fct_orders_items", "relationships", "part_key", "dim_part", "part_key"),
    ("fct_orders_items", "relationships", "supplier_key", "dim_supplier", "supplier_key"),
)


def run_reference_checks(ctx) -> list[CheckResult]:
    results = []
    for spec in REFERENCE_SUITE:
        model, kind, column = spec[0], spec[1], spec[2]
        df = ctx.ref(model)
        if kind == "unique":
            v = check_unique(df, column)
        elif kind == "not_null":
            v = check_not_null(df, column)
        else:
            parent, parent_col = spec[3], spec[4]
            v = check_relationships(df, column, ctx.ref(parent), parent_col)
        results.append(CheckResult(model, kind, column, v))
    return results
