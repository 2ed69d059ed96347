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
#: Round-4 rotation (VERDICT r3 #2/#3): 122 of 172 queries had no driver
#: row after r3, so the window now carries a ~17-query stable anchor core
#: (one per operator family, comparable across rounds), the models whose
#: window stack was rewritten to bucketed ranks this round, and 30 queries
#: with NO prior driver row in CORRECTNESS_r01-r03 (all the families the
#: verdict listed: simhash/semantic dedup, boilerplate n-grams,
#: triangles/k-core, funnel/retention/DAU-WAU/attribution, decontamination,
#: PCA, forecast, bot-score, k-anon, EWMA, surprisal, adapted TPC-H
#: Q9/Q11/Q16/Q19/Q20 plus the Q3/Q10/Q18 top-k classics).
_DRIVER_WINDOW: tuple[str, ...] = (
    # stable anchor core (P/F/J/A/W + one head per pipeline family)
    "ods_orders",
    "orders_items",
    "fct_orders",
    "dim_customer",
    "rpt_pricing_summary",
    "int_market_basket",
    "metrics_top_parts_trending",
    "customer_churn_risk",
    "monthly_revenue_kpis",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "events_hll_users",
    "events_session_30m",
    "docs_bm25_topk",
    "parts_pagerank",
    # (int_customer_orders_summary / multimodal_metadata anchors rest on
    # their r1-r3 green rows this round; phash_dedup covers multimodal)
    # window-stack rewrites this round (bucketed exact rank/cumsum/ntile —
    # driver-verify the new plans; rfm/abc are anchors of this group)
    "customer_rfm_segments",
    "part_abc_classification",
    "customer_concentration_risk",
    "supplier_revenue_ranking",
    "part_sales_velocity",
    # never-driver-verified rotation (30)
    "dedup_simhash_pairs",
    "dedup_semantic_pairs",
    "docs_boilerplate_ngrams",
    "parts_kcore",
    "parts_triangle_count",
    "events_conversion_funnel",
    "events_retention_cohorts",
    "events_dau_wau",
    "events_attribution_multitouch",
    "docs_decontaminated",
    "docs_ngram_decontam",
    "embeddings_pca_variance",
    "monthly_revenue_forecast",
    "user_bot_score",
    "customer_kanon_report",
    "events_value_ewma",
    "doc_bigram_surprisal",
    "tpch_q09_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q03_shipping_priority",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customer",
    "customers_semi_anti",
    "ann_ivf_kmeans_topk",
    "multimodal_phash_dedup",
    "docs_mixture_sample",
    "events_transition_matrix",
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
