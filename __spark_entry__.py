"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1, reference:
models/wh/rpt_pricing_summary.sql) at sf0.001. ``queries()`` exposes every
implemented model/operator; ``oracle_sql()`` the DuckDB-equivalent SQL.
"""

from __future__ import annotations

import glob
import json
import os
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
#: prefix, leaving every dedup/ANN/streaming/sketch query driver-unverified;
#: rounds 3-7 hand-curated a rotation.  Round 8 (VERDICT r7 #1 + #4) makes
#: the rotation SELF-DERIVING: the window is the 12 stable anchors below
#: (one per operator family, comparable across rounds) plus the
#: never-driver-witnessed queries computed from the CORRECTNESS_r*.json
#: union on disk — a new round needs zero diff here, and a typo'd name
#: fails loudly at import instead of silently burning a driver slot.
_WINDOW_SIZE = 50

#: stable anchor core (P/F/J/A/W + one head per pipeline family) — kept
#: identical across rounds so cross-round bench/correctness rows compare.
_ANCHORS: tuple[str, ...] = (
    "ods_orders",
    "fct_orders",
    "rpt_pricing_summary",
    "int_market_basket",
    "customer_churn_risk",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "events_hll_users",
    "parts_pagerank",
    # trim tail: families below stay covered via fill/adapted queries even
    # when a ledger-closing round drops these anchors (stratification test)
    "events_session_30m",
    "docs_bm25_topk",
    "tpch_q06_forecast_revenue",
)

#: Fill priority (VERDICT r7 #1): the 51 queries that had NO driver row
#: after round 7, oldest debt first — they outrank anything added in
#: round 8+ (which would otherwise displace them via registry order,
#: since the model layers register before the operator modules). Names
#: already witnessed are skipped automatically, so this list decays to a
#: no-op as the union completes; genuinely new queries join the fill in
#: registry order behind it.
_PRIORITY: tuple[str, ...] = (
    # the 8 r7-verdict heads
    "events_quantile_sketch",
    "events_watermark_lateness_profile",
    "orders_backlog_timeseries",
    "events_funnel_1h",
    "events_power_analysis",
    "docs_crosslingual_dup_census",
    "orders_fulfillment_latency",
    "events_stream_session_30m",
    # round-9 ledger close (VERDICT r8 #1): the exact 39 queries with no
    # driver row after round 8 — the r8 adapted/stream crop plus the
    # stats/docs stragglers.  Pinned ahead of any round-9 addition so new
    # registrations cannot displace them before the union reaches 298/298.
    "tpch_q04_order_priority_adapted",
    "tpch_q12_shipping_modes_adapted",
    "tpch_q21_suppliers_waiting_adapted",
    "supplier_lead_time_distribution_adapted",
    "metrics_supplier_reliability_adapted",
    "int_supplier_performance_adapted",
    "fulfillment_priority_analysis_adapted",
    "int_shipping_delays_adapted",
    "metrics_shipping_efficiency_adapted",
    "int_order_items_enriched_adapted",
    "supplier_scorecard_adapted",
    "parts_suppliers_adapted",
    "dim_part_supplier_xrf_adapted",
    "int_supplier_parts_catalog_adapted",
    "int_part_profitability_adapted",
    "metrics_profit_margin_trend_adapted",
    "part_type_performance_adapted",
    "supplier_concentration_risk_adapted",
    "dedup_minhash_incremental",
    "dedup_incremental_census",
    "events_retention_triangle",
    "events_type_transitions",
    "events_qsketch_merge_check",
    "events_stream_qsketch",
    "events_stream_hll_users",
    "events_stream_clicks_before_errors",
    # the rest of the round-7 never-witnessed ledger, registry order
    "brand_price_quantity_fit",
    "customer_balance_window_stats",
    "orders_benford_check",
    "doc_fingerprints",
    "doc_unigram_surprisal",
    "doc_repetition_stats",
    "doc_bpe_merges",
    "lang_tokenizer_fertility",
    "doc_quality_classifier",
    "docs_dsir_weights",
    "doc_lang_confusion",
    "embeddings_quantize_int8",
    "embeddings_label_cohesion",
    "embeddings_negative_samples",
    "embeddings_kcenter_sample",
    "multimodal_audio_energy",
    "docs_sample_stratified",
    "docs_shard_assignment",
    "doc_chunks",
    "docs_sample_topn_per_lang",
    "docs_sample_weighted",
    "docs_split_assign",
    "docs_mixture_temperature",
    "docs_token_waterfill",
    "docs_gumbel_topk",
    "docs_reservoir_per_source",
    "doc_tfidf_terms",
    "doc_bigram_pmi",
    "docs_inverted_index",
    "source_vocab_divergence",
    "doc_token_entropy",
    "docs_rank_overlap",
    "docs_rrf_fusion",
    "source_js_divergence",
    "docs_ndcg_fused",
    "docs_oov_rate",
    "events_value_zscore",
    "events_value_mad_outliers",
    "events_mean_shift",
    "docs_dsir_ess",
    "embeddings_int8_quant",
    "embeddings_label_outliers",
    "lineitem_column_stats",
    # round-9 additions: behind the whole r8 ledger so they cannot displace
    # it from the closing window; first in line for round 10
    "events_stream_dedup",
    "docs_pii_census",
    # round-10 addition (VERDICT r9 #6): the production multi-batch ingest
    # shape, promoted from pytest-only to an oracle-checked query
    "dedup_multibatch_txn",
    # round-11 addition: b-bit signature compaction estimator (Li & König)
    "dedup_bbit_minhash",
    # round-11 addition: positional cross-doc duplicate spans (ExactSubstr
    # semantics re-expressed relationally — Lee et al. 2022)
    "docs_dup_spans",
    # round-11 addition: the stream-STATIC join witness (seventh
    # readStream witness; the join class the interval witness misses)
    "events_stream_enrich",
    # round-11 addition: the span-excision REWRITE step (ExactSubstr
    # removal — cut the duplicated span, keep the doc)
    "docs_excise_spans",
)


def _witness_rounds() -> dict[str, int]:
    """Latest round with an all-gates-green driver row, per query
    (rows+schema+hash matched, no error) — the union the verdict tracks,
    plus the recency the round-10 staleness rotation sorts by."""
    root = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                record = json.load(fh)
        except (OSError, ValueError) as exc:
            # ADVICE r8: a present-but-unreadable artifact silently shrinks
            # the witnessed union and burns driver slots re-verifying known
            # queries — warn loudly instead of skipping without a trace
            # (not raising: a driver-truncated artifact must not brick the
            # whole contract import).
            import warnings

            warnings.warn(
                f"skipping unparseable correctness record {path}: {exc!r}",
                stacklevel=2,
            )
            continue
        stem = os.path.basename(path)
        try:
            rnd_no = int(stem[len("CORRECTNESS_r"):].split(".")[0])
        except ValueError:
            rnd_no = 0
        for name, row in record.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                latest[name] = max(latest.get(name, 0), rnd_no)
    return latest


def _witnessed() -> frozenset[str]:
    """Queries with an all-gates-green driver row in any recorded round."""
    return frozenset(_witness_rounds())


def _eligible() -> list[str]:
    return [n for n, spec in MODELS.items() if spec.layer in _QUERY_LAYERS]


#: A witnessed query whose latest driver row is this many rounds behind the
#: newest recorded round counts as ROTATION DEBT: it competes with anchors
#: for window slots (same trim rule as the never-witnessed ledger), so the
#: whole surface re-witnesses on a ~(surface / ~44-slot) round cycle instead
#: of the registry prefix re-confirming forever (VERDICT r9 #3).
_STALE_AGE = 5


def _derive_window() -> tuple[str, ...]:
    eligible = _eligible()
    unresolved = (set(_ANCHORS) | set(_PRIORITY)) - set(eligible)
    if unresolved:  # fail loudly — a typo must not burn a driver slot
        raise AssertionError(
            f"driver-window names do not resolve to registered queries: "
            f"{sorted(unresolved)}"
        )
    witnessed = _witnessed()
    never = [n for n in eligible if n not in witnessed]
    fill = [n for n in _PRIORITY if n in never]
    fill += [n for n in never if n not in fill]
    # Staleness rotation (VERDICT r9 #3): once the never-witnessed ledger is
    # closed, spend the spare slots on the queries whose last driver witness
    # is OLDEST, not on the registry prefix. Ordering key = (latest witness
    # round, registry position); names the monkeypatched-witnessed tests
    # inject without a recorded round sort as round 0 (most urgent).
    latest = _witness_rounds()
    newest_round = max(latest.values(), default=0)
    registry_pos = {n: i for i, n in enumerate(eligible)}
    rotation = sorted(
        (n for n in eligible if n in witnessed),
        key=lambda n: (latest.get(n, 0), registry_pos[n]),
    )
    stale_due = [
        n for n in rotation if newest_round - latest.get(n, 0) >= _STALE_AGE
    ]
    # Ledger-closing trim (VERDICT r8 #1): when the never-witnessed set
    # needs more slots than the 50-window leaves after the anchors, drop
    # anchors from the tail (they are all long-witnessed; re-confirmation
    # is worth less than a first witness) down to a floor of 6 so the
    # cross-round comparison core survives.
    anchors = list(_ANCHORS)

    def _demand() -> int:
        # recompute each pop: a popped anchor that is itself never-witnessed
        # re-enters via fill, so the slot it frees is reclaimed — a stale
        # pre-loop count would stop trimming early and spill a
        # never-witnessed query out of the window (round-9 review)
        claimed = set(anchors)
        n = len(anchors)
        for name in fill:
            if name not in claimed:
                claimed.add(name)
                n += 1
        # rotation debt claims slots the same way (VERDICT r9 #3): a window
        # full of fresh-anchor re-confirmations is worth less than retiring
        # a witness that is _STALE_AGE+ rounds old
        for name in stale_due:
            if name not in claimed:
                claimed.add(name)
                n += 1
        return n

    while len(anchors) > 6 and _demand() > _WINDOW_SIZE:
        anchors.pop()
    window = anchors
    for name in fill:
        if len(window) >= _WINDOW_SIZE:
            break
        if name not in window:
            window.append(name)
    # spare slots: top up witnessed queries OLDEST-LATEST-WITNESS-FIRST so
    # the driver record stays a full 50 rows and the whole surface cycles
    # (registry order broke ties before round 10 and re-confirmed the same
    # prefix forever — VERDICT r9 #3)
    for name in rotation:
        if len(window) >= _WINDOW_SIZE:
            break
        if name not in window:
            window.append(name)
    # pathological fallback (tests inject witnessed sets with no recorded
    # rounds): keep the 50-slot guarantee via registry order
    for name in eligible:
        if len(window) >= _WINDOW_SIZE:
            break
        if name not in window:
            window.append(name)
    return tuple(_repair_stratification(window, fill, rotation, eligible))


#: One predicate per operator family the driver window must always carry
#: (mirrors tests/test_driver_window.py::test_first_50_is_stratified). The
#: staleness rotation fills oldest-first, and the oldest witnesses are the
#: registry-early relational prefix — without this repair pass a rotation
#: round would ship a window with zero ANN/sketch/graph representatives.
_FAMILY_PREDICATES: tuple[Callable[[str], bool], ...] = (
    lambda n: n.startswith("dedup_"),
    lambda n: n.startswith(("ann_", "kmeans_")),
    lambda n: "hll" in n or "cms" in n,
    lambda n: n.startswith("events_") or n == "user_state_scd",
    lambda n: n.startswith(("docs_", "doc_")),
    lambda n: n == "parts_pagerank",
    lambda n: n.startswith("tpch_q"),
    lambda n: n.startswith(("rpt_", "fct_", "dim_")),
)


def _repair_stratification(
    window: list[str],
    fill: list[str],
    rotation: list[str],
    eligible: list[str],
) -> list[str]:
    """Swap the youngest redundant re-confirmation out for the oldest
    member of any family the window lost. Never evicts an anchor, a
    never-witnessed fill entry, or a family's sole representative."""
    fill_set = set(fill)
    for pred in _FAMILY_PREDICATES:
        if any(pred(n) for n in window):
            continue
        candidate = next(
            (n for n in rotation + eligible if pred(n) and n not in window),
            None,
        )
        if candidate is None:
            continue
        for i in range(len(window) - 1, -1, -1):
            victim = window[i]
            if victim in _ANCHORS or victim in fill_set:
                continue
            fam = [p for p in _FAMILY_PREDICATES if p(victim)]
            if any(sum(1 for n in window if p(n)) <= 1 for p in fam):
                continue  # sole representative of some family — keep it
            window[i] = candidate
            break
    return window


_DRIVER_WINDOW: tuple[str, ...] = _derive_window()


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
    eligible = _eligible()
    window = list(_DRIVER_WINDOW)
    ordered = window + [n for n in eligible if n not in set(window)]
    return {name: _model_query(name) for name in ordered}


def oracle_sql() -> dict[str, str]:
    rendered = _oracle.all_rendered()
    return {name: rendered[name] for name in queries() if name in rendered}
