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
#: Round-6 rotation (VERDICT r5 #3): 108 of 253 queries still had no
#: driver row after r5 (cumulative union 145). This window keeps a
#: 12-query stable anchor core (one per operator family, comparable
#: across rounds — the 4 dropped anchors each have 2+ green driver rows
#: already), re-witnesses the three pair-stage queries whose plans were
#: bounded this round plus the two new queries (CDC audit, LSH recall
#: harness), and fills the rest with never-driver-verified queries in
#: the r5 verdict's priority order: the modeleval family, the r5 stats
#: additions, rank statistics, BPE, LSH planner, ROLLUP, survival,
#: perplexity.
_DRIVER_WINDOW: tuple[str, ...] = (
    # stable anchor core (P/F/J/A/W + one head per pipeline family)
    "ods_orders",
    "fct_orders",
    "rpt_pricing_summary",
    "int_market_basket",
    "customer_churn_risk",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "events_hll_users",
    "events_session_30m",
    "docs_bm25_topk",
    "parts_pagerank",
    "tpch_q06_forecast_revenue",
    # pair-stage plans bounded this round: re-witness, plus the two new
    # queries (table-format CDC audit, embedding-LSH recall harness)
    "dedup_embedding_cosine",
    "embeddings_xlabel_margin",
    "embeddings_dup_threshold_curve",
    "txn_snapshot_diff",
    "dedup_embedding_lsh_recall",
    # never-driver-verified rotation (33)
    "doc_quality_auc",
    "doc_quality_pr_auc",
    "doc_quality_calibration",
    "doc_quality_mcnemar",
    "doc_langid_kappa",
    "vocab_zipf_fit",
    "vocab_heaps_fit",
    "events_user_spearman",
    "events_ab_welch",
    "events_ab_cuped",
    "events_ab_srm_check",
    "order_mean_jackknife_ci",
    "events_ratio_metric_ci",
    "bpe_train_merges",
    "lsh_band_collision_stats",
    "orders_rollup_revenue",
    "docs_quality_quantile_norm",
    "docs_l_diversity",
    "events_mad_anomaly",
    "events_boxplot_stats",
    "events_hll_sliding_users",
    "docs_fd_violations",
    "source_loo_impact",
    "docs_quality_survivors",
    "dedup_lsh_recall_report",
    "parts_degree_assortativity",
    "user_survival_km",
    "lm_heldout_perplexity",
    "events_ks_test",
    "events_mannwhitney",
    "events_benford",
    "customer_gini",
    "order_trimmed_mean",
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
