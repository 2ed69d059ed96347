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
#: Round-5 rotation (VERDICT r4 #1): 83 of 194 queries still had no
#: driver row after r4 (cumulative union 111). This window keeps a
#: 15-query stable anchor core (one per operator family, comparable
#: across rounds), re-verifies the two graph queries whose broadcast
#: plans were gated/rewritten this round, and fills the remaining 33
#: slots with queries that have NEVER had a driver row, in the r4
#: verdict's priority order: the r4 additions that shipped without a
#: driver row (ppjoin/SNM/editdist, chi-square/corr/MI/quantiles,
#: hll_type_overlap/bottomk, neighbor_similarity, cluster-aware splits,
#: dataset card, centroid similarity, minhash error gate), then the
#: streaming-batch family, ANN variants, and TPC-H Q6/Q7/Q8/Q14/Q15/Q17.
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
    # plan-rewritten this round (gated broadcasts, oriented wedges):
    # re-witness under the new plans
    "parts_triangle_count",
    "parts_neighbor_similarity",
    # never-driver-verified rotation (33)
    "dedup_ppjoin",
    "dedup_sorted_neighborhood",
    "dedup_editdist_pairs",
    "events_chi_square",
    "lineitem_corr_matrix",
    "events_mutual_information",
    "events_sampled_quantiles",
    "events_hll_type_overlap",
    "events_bottomk_merge_check",
    "docs_split_by_cluster",
    "docs_split_leakage",
    "docs_shard_by_cluster",
    "docs_dataset_card",
    "embeddings_centroid_similarity",
    "minhash_estimate_error",
    "events_tumbling_10m",
    "events_sliding_10m_5m",
    "events_json_props",
    "events_props_schema",
    "events_value_histogram",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_lsh_multiprobe_topk",
    "tpch_q06_forecast_revenue",
    "tpch_q07_volume_shipping",
    "tpch_q08_market_share",
    "tpch_q14_promotion_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "docs_dedup_survivors",
    "dedup_method_agreement",
    "doc_text_stats",
    "docs_clean_corpus",
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
