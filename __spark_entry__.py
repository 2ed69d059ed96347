"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1, reference:
models/wh/rpt_pricing_summary.sql) at sf0.001. ``queries()`` exposes every
implemented model/operator; ``oracle_sql()`` the DuckDB-equivalent SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_tpch_spark.plans import MODELS, Context, import_all_models
from dbt_tpch_spark.models import oracle as _oracle

import_all_models()

#: model layers exposed as driver queries (base is ephemeral feedstock).
_QUERY_LAYERS = {
    "ods",
    "wh",
    "intermediate",
    "metrics",
    "reports",
    "extended",
    "operators",
    "streaming",
}

#: queries with no SQL-expressible oracle (driver records rows-only checks).
NO_ORACLE: tuple[str, ...] = ()

#: The driver's correctness record caps at 50 entries taken in dict
#: insertion order.  Rounds 1-2 burned all 50 on the same relational
#: prefix, leaving every dedup/ANN/streaming/sketch query driver-unverified.
#: This curated prefix stratifies the window across ALL families:
#: ~20 relational anchors covering the P/F/J/A/W operator matrix, then one
#: or more representatives of each LLM-pipeline/streaming/sketch family.
#: Everything else follows in registry order (and stays oracle-checked by
#: the repo's own parity sweep, tests/test_parity.py).
_DRIVER_WINDOW: tuple[str, ...] = (
    # relational anchors (P/F/J/A/W coverage per SURVEY.md §2)
    "ods_orders",
    "orders_items",
    "fct_orders",
    "dim_customer",
    "rpt_pricing_summary",
    "int_customer_orders_summary",
    "int_market_basket",
    "int_discount_impact",
    "metrics_customer_retention",
    "metrics_top_parts_trending",
    "regional_trade_balance",
    "customer_churn_risk",
    "customer_rfm_segments",
    "monthly_revenue_kpis",
    "monthly_order_trends",
    "part_abc_classification",
    "customer_purchase_frequency_bands",
    "order_status_funnel",
    "customer_cohort_retention",
    "rpt_minimum_cost_suppliers_adapted",
    # data-quality + TPC-H classics
    "dq_summary",
    "tpch_q05_local_supplier_volume",
    "tpch_q13_customer_distribution",
    "tpch_q22_global_sales_opportunity",
    # dedup family (simhash/source-matrix variants stay parity-checked by
    # tests/test_parity.py; the window favors one member per sub-family)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_incremental_ingest",
    "dedup_clusters",
    # similarity / ANN family
    "ann_cosine_topk",
    "ann_pq_adc_topk",
    "ann_recall_report",
    "kmeans_cells",
    # sketches
    "events_hll_users",
    "events_hll_merge_check",
    "events_cms_topusers",
    # time series / temporal joins / streaming twins
    "events_gapfill_hourly",
    "events_session_30m",
    "events_asof_last_click",
    "events_value_quantile_bins",
    "events_value_psi",
    "events_props_redaction",
    "user_state_scd",
    # retrieval + sampling/sharding/packing
    "docs_bm25_topk",
    "docs_training_manifest",
    "docs_winnow_dups",
    "docs_shuffle_global",
    "doc_pack_sequences",
    "doc_language_id",
    # graph + multimodal plumbing
    "parts_pagerank",
    "multimodal_metadata",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ctx = Context(spark, "/root/testdata/sf0.001")
    return ctx.ref("rpt_pricing_summary")


def _model_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return Context(spark, sf_dir).ref(name)

    run.__name__ = f"query_{name}"
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    eligible = [
        name for name, spec in MODELS.items() if spec.layer in _QUERY_LAYERS
    ]
    window = [n for n in _DRIVER_WINDOW if n in MODELS]
    ordered = window + [n for n in eligible if n not in set(window)]
    return {name: _model_query(name) for name in ordered}


def oracle_sql() -> dict[str, str]:
    rendered = _oracle.all_rendered()
    return {name: rendered[name] for name in queries() if name in rendered}
