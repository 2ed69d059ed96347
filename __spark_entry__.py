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
#: Round-7 rotation (VERDICT r6 #1): 80 of 263 queries had no driver row
#: after r6 (cumulative union 183). This window keeps the same 12-query
#: stable anchor core (one per operator family, comparable across
#: rounds), then fills every remaining slot with never-driver-verified
#: queries in the r6 verdict's priority order: the 8 queries added after
#: the round-6 window froze, the new true-readStream witness (r6 #6),
#: then the oldest never-witnessed families — simjoin/linkage beyond
#: PPJoin, sketch variants, the temporal/as-of tails, and the PQ/RP
#: embedding compression family.
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
    # the 8 round-6 post-freeze additions (VERDICT r6 #1 priority head)
    "docs_bpe_token_counts",
    "kmeans_silhouette_sample",
    "docs_pipeline_funnel",
    "docs_ngram_novelty",
    "docs_dedup_cluster_purity",
    "docs_quality_by_dup_status",
    "embeddings_knn_label_accuracy",
    "emb_lsh_band_stats",
    # the true-readStream witness added this round (VERDICT r6 #6)
    "events_stream_tumbling_10m",
    # simjoin / record-linkage / dedup-report family (never witnessed)
    "customers_linkage_scores",
    "customers_entity_clusters",
    "dedup_ngram_jaccard",
    "dedup_simhash_signatures",
    "dedup_ngram_containment",
    "dedup_doc_labels",
    "dedup_source_matrix",
    "doc_winnow_fingerprints",
    # sketch variants (never witnessed)
    "customers_bloom_prune",
    "lineitem_joinsize_cms",
    "joinsize_ndv_estimate",
    "lineitem_skew_report",
    "events_schema_drift",
    # temporal / as-of tails (never witnessed)
    "events_range_context",
    "events_asof_nearest",
    "events_time_rollup",
    "events_seasonal_anomaly",
    "events_incremental_rollup_check",
    "events_attribution",
    "daily_revenue_acf",
    "daily_revenue_theilsen",
    "user_interarrival_burstiness",
    "events_temporal_split_embargo",
    # embedding compression / projection family (never witnessed)
    "embeddings_pq_codes",
    "ann_pq_rotated_topk",
    "embeddings_random_projection",
    "embeddings_rp_distortion",
    # multimodal Arrow path (never witnessed)
    "multimodal_features",
    "multimodal_frame_sample",
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
