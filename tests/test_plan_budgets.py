"""Shuffle-budget regression guards for the headline queries.

Every Exchange (non-broadcast, non-reused) in a physical plan is a full
shuffle of its input at 100 TB; these budgets pin the current plan shapes
so a regression (a lost broadcast hint, a new unintended repartition, a
window that stops reusing a sort) fails CI instead of silently multiplying
cluster cost. Budgets are the audited shuffle counts at the time the plan
was reviewed — raising one is a deliberate, reviewed act.
"""

from __future__ import annotations

import pytest

from dbt_tpch_spark.plans import Context, import_all_models

import_all_models()

#: name -> max allowed shuffle exchanges in the executed plan
SHUFFLE_BUDGETS = {
    "rpt_pricing_summary": 1,
    "fct_orders": 1,
    "fct_orders_items": 0,
    "dim_customer": 0,
    # round 11: the order_key self-join became an in-row expansion of the
    # per-order sorted part set — basket agg + pair agg + totals agg
    "int_market_basket": 3,
    # round 4: the 3 global NTILEs moved onto bucketed exact ranks over the
    # checkpointed customer-grain aggregate — 3 bounded exchanges, no
    # single-partition ntile windows
    "customer_rfm_segments": 3,
    # round 4: the other SF-linear-grain window reports on the same
    # bucketed machinery (bucketed_windows/global_ntile)
    "customer_concentration_risk": 3,
    "part_abc_classification": 3,
    "supplier_revenue_ranking": 5,
    "part_sales_velocity": 3,
    # round-4 operators: changepoint (type+hour agg + window sort),
    # neighborhood-Jaccard wedge join family, containment (shingle join)
    "events_mean_shift": 2,
    # sampled-adjacency wedge family: per-node sample window + sampled-
    # degree agg + wedge join sides + pair agg + top-k window, all on the
    # checkpointed edge/adjacency tables (exact-wedge variant measured
    # 103 s at sf0.1 vs ~14 s sampled — the sampling IS the scale design)
    "parts_neighbor_similarity": 7,
    # degree-oriented wedges (round 5): post-checkpoint plan — wedge
    # self-join on u + close semi-join + per-node explode agg + the gated
    # verdict join; orientation bounds wedge fan-out at Σ outdeg² ≤ m^1.5
    "parts_triangle_count": 5,
    # +1 in round 4: the tokens_df repartition barrier that stops Catalyst
    # inlining the split() into the shingle lambda (O(words^2) regex per
    # doc, PLANS.md CollapseProject hazard) — one bounded exchange bought
    # back ~4x scan CPU
    "dedup_ngram_containment": 4,
    # temperature mixing: the checkpointed source-stats frame leaves the
    # per-source rank window as the only corpus shuffle; the classifier is
    # a map-only scan
    "docs_mixture_temperature": 1,
    "doc_quality_classifier": 0,
    # JSON schema census: map-entries explode + key agg + 1-row total
    "events_props_schema": 2,
    "monthly_revenue_kpis": 4,
    "dedup_minhash_lsh": 7,
    # same DAG with the probe side filtered to the increment split
    "dedup_minhash_incremental": 7,
    # census over the checkpointed pair table (3 consumers, built once)
    "dedup_incremental_census": 7,
    # per-batch verdicts are localCheckpointed during the 3-commit build
    # (the band joins run as side jobs); the query plan is a union of
    # checkpointed scans — 0 visible exchanges
    "dedup_multibatch_txn": 0,
    # LSH pair DAG (7) + signature projection repartition + 2 sig joins
    "dedup_bbit_minhash": 10,
    # first-event agg + (user, week) distinct + user join + triangle agg
    "events_retention_triangle": 5,
    # per-user partitioned LAG + bounded |types|^2 agg + broadcast margins
    "events_type_transitions": 5,
    "ann_cosine_topk": 1,
    "events_session_30m": 1,
    # the drained memory-sink result of the TRUE readStream run: the
    # streaming job already aggregated, the batch-side plan is a pure scan
    "events_stream_tumbling_10m": 0,
    "events_stream_session_30m": 0,
    # foreachBatch pane maintenance: output is the <=550-row local pane
    "events_stream_qsketch": 0,
    # HLL pane twin: output is the <= types x 256 register-derived frame
    "events_stream_hll_users": 0,
    # stream-stream join drains append-mode into the memory sink
    "events_stream_clicks_before_errors": 0,
    # dropDuplicatesWithinWatermark drains append-mode into the memory
    # sink: batch-side plan over the drained table is a pure scan
    "events_stream_dedup": 0,
    # one projection of regexp_count attributes + one source-grain agg
    "docs_pii_census": 1,
    # one bucket-grain aggregation + the <=550-row cumulative window +
    # the exact-percentile comparison aggregate (stack-unpivot keeps the
    # corpus single-pass: a per-q UNION re-ran these 3x, 9 shuffles)
    "events_quantile_sketch": 3,
    # daily agg + merged re-agg + direct agg + full-outer join align; the
    # cumulative windows ride the <=550-row joined sketch
    "events_qsketch_merge_check": 4,
    # range-bucketed running max: corpus agg to buckets, per-bucket
    # window, <=32-row offset lift, band histogram
    "events_watermark_lateness_profile": 5,
    # interval -> delta-event rewrite: orders∪lineitem-rollup to day
    # grain, one running sum over the calendar-bounded day table
    "orders_backlog_timeseries": 3,
    # three user-grain step aggregates chained on the user_id shuffle
    # key; step frames checkpointed (two consumers each: 8 -> 4)
    "events_funnel_1h": 4,
    # census is checkpointed (<=|lang|^2 rows, two consumers): the LSH
    # pipeline runs once at build, the query plan is the bounded rollup
    "docs_crosslingual_dup_census": 1,
    # lineitem rollup + order join share the order-key shuffle; one
    # bounded-grain (priority) aggregate with exact percentiles
    "orders_fulfillment_latency": 2,
    # one bounded-grain moment aggregation; the rest is row-local math
    "events_power_analysis": 1,
    "doc_text_stats": 0,
    "events_asof_last_click": 2,
    "doc_pack_sequences": 1,
    "kmeans_cells": 2,
    "docs_bm25_topk": 6,
    "events_gapfill_hourly": 2,
    # round 3: the final importance rank moved off the single-partition
    # window onto bucketed exact ranking — 3 node-sized partitioned
    # exchanges (bucket window + counts agg + offsets) instead of one
    # whole-state sort on a single task
    "parts_pagerank": 3,
    "ann_pq_adc_topk": 4,
    "tpch_q05_local_supplier_volume": 1,
    "events_hll_users": 4,
    "customers_bloom_prune": 3,
    "events_cms_topusers": 4,
    "customers_semi_anti": 3,
    "tpch_q22_global_sales_opportunity": 2,
    # round-8 adapted classics (ship-lag lateness proxy): Q4 = broadcast
    # semi-join + bounded priority agg (1 shuffle); Q12 likewise onto the
    # 3-value returnflag agg; Q21 = orderkey join reused by the per-order
    # agg + supplier-wait agg + TakeOrderedAndProject top-20 (no global
    # sort) = 3
    "tpch_q04_order_priority_adapted": 1,
    "tpch_q12_shipping_modes_adapted": 1,
    "tpch_q21_suppliers_waiting_adapted": 3,
    # round-8 adapted reliability family: one items scan -> one aggregate
    # each with the supplier dim broadcast; fulfillment joins fact-to-fact
    # on order_key (2) then lands on the bounded priority x returnflag
    # grain (+ distinct-expand re-shuffles)
    "supplier_lead_time_distribution_adapted": 1,
    "metrics_supplier_reliability_adapted": 1,
    "int_supplier_performance_adapted": 2,
    "fulfillment_priority_analysis_adapted": 4,
    # round-8 partsupp-proxy catalog family: the pair catalog is ONE
    # groupBy(part, supplier) shuffle; everything downstream rides it
    # (dims join hint-free/broadcast); concentration adds the J10
    # agg-join-back; scorecard is the reference's own 3-CTE supplier-grain
    # shape; the enriched view is 3 LEFT joins over the fact feedstock
    "parts_suppliers_adapted": 1,
    "dim_part_supplier_xrf_adapted": 1,
    "int_supplier_parts_catalog_adapted": 1,
    "int_part_profitability_adapted": 1,
    "metrics_profit_margin_trend_adapted": 1,
    "part_type_performance_adapted": 2,
    "supplier_concentration_risk_adapted": 4,
    "int_shipping_delays_adapted": 0,
    "metrics_shipping_efficiency_adapted": 1,
    "int_order_items_enriched_adapted": 4,
    "supplier_scorecard_adapted": 6,
    # round-3 operators
    "embeddings_pca_variance": 2,
    "embeddings_negative_samples": 1,
    # round 11: every signal folds in-row over the doc's own word array —
    # one projection over the scan, no explode/window/agg/join at all
    "doc_repetition_stats": 0,
    "doc_bpe_merges": 2,
    "dedup_source_matrix": 8,  # 7 inherited from dedup_minhash_lsh + 1 rollup
    "events_attribution": 2,
    "events_incremental_rollup_check": 4,
    "rpt_minimum_cost_suppliers_adapted": 2,
    "docs_shuffle_global": 3,
    "events_value_quantile_bins": 4,
    # round 3: adapted TPC-H tail (part/supplier sides broadcast; the only
    # shuffles are the fact-side joins/aggregates)
    "tpch_q09_product_type_profit": 1,
    "tpch_q11_important_stock": 2,
    "tpch_q16_parts_supplier_relationship": 3,
    "tpch_q19_discounted_revenue": 1,
    "tpch_q20_potential_promotion": 1,
    # round 3: substring-dup family — winnow fingerprints are pure per-row
    # array arithmetic (zero shuffles); the pair model pays the fp-bucketed
    # join; boilerplate follows the doc_repetition_stats 3-branch pattern
    "doc_winnow_fingerprints": 0,
    "docs_boilerplate_ngrams": 4,
    "docs_winnow_dups": 5,  # post-materialization plan (fp index checkpoints once)
    # round 11: positional dup spans — 2 pre-explode doc_id repartitions
    # (census + probe branch) + the shingle census agg; the dup-set join
    # is hint-free (AQE broadcast while small) and both islands windows +
    # both per-doc aggs ride hash(doc_id) exchange-free
    "docs_dup_spans": 3,
    # the excision rewrite: post-materialization plan (the surviving-span
    # frame checkpoints once - its two consumers would otherwise re-run
    # the census+islands subtree); what remains is the token-frame
    # repartition pair + the reassembly agg, all on hash(doc_id)
    "docs_excise_spans": 3,
    # map-only scrub scan / one repartition feeding the Arrow audio decode
    "events_props_redaction": 0,
    "multimodal_audio_energy": 1,
    # SemDeDup: kmeans rounds (argmin aggs) + the cell-scoped pair join;
    # incremental ingest: post-materialization plan (the banded signature
    # table checkpoints once, as a standing index would persist)
    "dedup_semantic_pairs": 2,  # post-materialization plan (assignment checkpoints once)
    "dedup_incremental_ingest": 5,  # 4 at local[32]; one verify join hovers at the broadcast boundary under the 8-partition test config
    # bidirectional as-of: one union shuffle on user_id + the window sort
    # pair; forecast: join + (segment, month) agg + segment moments
    "events_asof_nearest": 2,
    "monthly_revenue_forecast": 3,
    # PSI: (type, bin) agg + generated grid join + type rollup;
    # fertility: lang agg + 1-row scalar broadcast
    "events_value_psi": 4,
    "lang_tokenizer_fertility": 3,
    # bucketed range join + per-purchase count + channel rollup + anti side
    "events_attribution_multitouch": 5,
    # quality-argmax survivor: one content-hash shuffle (stats join is
    # doc_id-side and AQE-sized)
    "docs_dedup_survivors": 1,
    # post-checkpoint plan only (the labeled pair set materializes once;
    # upstream detector budgets are pinned on their own rows)
    "dedup_method_agreement": 6,
    # JL projection is a map-only scan; the distortion report pays one
    # sample-pair join
    "embeddings_random_projection": 0,
    "embeddings_rp_distortion": 1,
    # one groupBy shuffle; suppression is projection-level
    "customer_kanon_report": 1,
    # bigram LM: post-materialization plan (the (doc,prev,w) tf table
    # checkpoints once) — model aggregates + scoring joins
    "doc_bigram_surprisal": 6,
    # one user_id repartition feeds both aggregate levels (subset rule)
    "user_bot_score": 1,
    # k-core verdict join over the checkpointed census + core table
    "parts_kcore": 2,
    # (user, day) distinct, DAU agg, contribute-to-window distinct + agg,
    # day-grain join
    "events_dau_wau": 5,
    # round-4 exact similarity joins: PPJoin pays the df agg + rarest-first
    # rank + prefix join + candidate dedup + the two verify joins (the
    # LSH-precedent shape); SNM's post-checkpoint plan (heads materialize
    # once) is the real-row scan + ghost union + the bucketed adjacency
    # window — remaining exchanges are on bounded or pair-sized frames
    "dedup_ppjoin": 8,
    "dedup_sorted_neighborhood": 8,
    # chi-square: ONE corpus aggregation materializes the <=|types|x7 cell
    # frame; every post-checkpoint exchange is over that bounded frame
    "events_chi_square": 8,
    # bottom-k sample (hex-group window + candidate agg) + bucketed exact
    # ranks (bucket window + counts + offsets) + the tiny p-joins
    "events_sampled_quantiles": 6,
    # corpus left-join to the checkpointed component labels
    "dedup_doc_labels": 2,
    # label join + bounded (split, lang) agg
    "docs_split_by_cluster": 4,
    # post-materialization plan: the enriched pair set checkpoints once;
    # one bounded-grain scheme aggregation remains
    "docs_split_leakage": 1,
    # ONE whole-table sufficient-statistics aggregation (6 pairwise corrs
    # share it); the pair explode is a 1-row projection
    "lineitem_corr_matrix": 1,
    # post-checkpoint (signature table materializes once): the LSH pair
    # pipeline + two sig hash-joins on the pair grain
    "minhash_estimate_error": 7,
    # one LSH pipeline consumption (explode-both-endpoints agg), exact-dup
    # agg, corpus profile scan — every post-join frame is <=1 row
    "docs_dataset_card": 13,
    # bounded contingency frames only: cells checkpoint once; margins,
    # entropies and the MI total are all <= |types| x 7-row exchanges
    "events_mutual_information": 10,
    # SNM halo machinery on (doc_id, skey, 80-char prefix) — no arrays in
    # the sort; Levenshtein runs on the W-adjacency pair grain only
    "dedup_editdist_pairs": 8,
    # one corpus posexplode -> (label, dim) agg; every later exchange is
    # on the |labels| x DIMS (or smaller) frame
    "embeddings_centroid_similarity": 9,
    # labels join + bounded 16-shard census
    "docs_shard_by_cluster": 4,
    # three bottom-k passes (hex-group windows + candidate merges) on the
    # hashed key column only
    "events_bottomk_merge_check": 6,
    # one (type, bucket) register aggregation (checkpointed); union-max,
    # estimates and the pair expansion run on the <= |types|*m register
    # frame; the exact-overlap error column pays the distinct self-join
    "events_hll_type_overlap": 8,
    # round-5 additions: Fellegi-Sunter rides the SNM halo (bounded pair
    # grain) + three bounded u-probability aggregations; margin mining is
    # the exactness baseline (checkpointed pair scores + two K-capped
    # neighborhood means + the final argmax window); DSIR's post-
    # materialization plan (the (doc,term) tf table checkpoints once)
    # pays the two vocab-grain LM aggregations + scoring joins
    "customers_linkage_scores": 6,
    "embeddings_xlabel_margin": 5,
    "docs_dsir_weights": 7,
    # CMS join-size: three sketch-cell aggregations (two checkpoint once)
    # + the bounded (<=1024-cell) inner-product joins + the exact FK-join
    # count and F2 aggregate; ACF's series frame is day-grain (bounded) so
    # the one fact aggregation is the only corpus shuffle; entity clusters
    # ride the linkage pair set (post-checkpoint: edges cache + the final
    # corpus left-join + size rollup)
    "lineitem_joinsize_cms": 8,
    "daily_revenue_acf": 1,
    "customers_entity_clusters": 6,
    # diagonal-Mahalanobis outliers: one per-(label,dim) stats agg
    # (bounded |labels| x DIMS broadcast back) + per-vec sum + the
    # WindowGroupLimit top-k per label; Theil-Sen / schema drift run on
    # calendar-bounded frames after one corpus aggregation; k-center's
    # rounds are narrow maps + TakeOrdered(1) argmaxes on checkpointed
    # state — zero shuffles in the final plan
    "embeddings_label_outliers": 3,
    "daily_revenue_theilsen": 4,
    "events_schema_drift": 4,
    "embeddings_kcenter_sample": 0,
    # rank overlap carries BOTH ranking pipelines (the bm25 DAG edge at
    # its own 6-shuffle budget + the tf-idf ranking on its own
    # checkpointed feedstock) + the bounded top-k overlap joins
    "docs_rank_overlap": 15,
    # held-out LM: post-materialization plan (the split-tagged bigram tf
    # table checkpoints once) — train LM aggs + vocab + the eval scoring
    # joins; waterfill runs entirely on the checkpointed <= |sources|-row
    # frame (the window sort is over 20 rows, the one corpus agg happens
    # at checkpoint build)
    "lm_heldout_perplexity": 7,
    "docs_token_waterfill": 0,
    # Welch / column stats: one corpus aggregation each to a <= 11-row
    # frame (the multi-count-distinct expand is the second exchange)
    "events_ab_welch": 2,
    "lineitem_column_stats": 2,
    # rank statistics (round 5): value-grain arm counts (1) + the bucketed
    # exact cumsum (stats agg + local-window hash; offsets ride a <=32-row
    # broadcast) + the final 1-row reduction; benford is two bounded aggs
    # + the digit census; burstiness reuses its user-partition sort for
    # the per-user agg, band rollup is bounded
    "events_ks_test": 4,
    "events_mannwhitney": 4,
    "events_benford": 3,
    "customer_gini": 4,
    "user_interarrival_burstiness": 2,
    # JS divergence: checkpointed (source,term) feedstock read by three
    # consumers; term-grain shuffle join (deliberately NOT broadcast) +
    # bounded source rollup
    "source_js_divergence": 6,
    # gumbel weighted sample: stateless map + TakeOrderedAndProject — the
    # zero-shuffle weighted-draw plan
    "docs_gumbel_topk": 0,
    # int8 quant: (row,dim) explode agg + gated 64-row broadcast back +
    # bounded label rollup
    "embeddings_int8_quant": 3,
    "doc_lang_confusion": 5,
    # per-source reservoir: one partitioned WindowGroupLimit
    "docs_reservoir_per_source": 1,
    # NDV estimate: two multi-distinct expands + two key-grain frequency
    # aggs + the frequency-product join
    "joinsize_ndv_estimate": 9,
    # classifier evals (round 5): join-free single-scan feedstock; AUC's
    # visible shuffles are the bucketed-cumsum machinery over the BOUNDED
    # (<=1e6-row, 6-dp score-grain) frame; calibration is one bin-grain
    # agg + a checkpointed <=10-row rollup
    "doc_quality_auc": 4,
    "doc_quality_calibration": 1,
    # zipf: vocab-grain term counts + the bucketed rank machinery
    "vocab_zipf_fit": 4,
    # spearman: user-grain agg rides the checkpoint; two bucketed rank
    # passes + the 1-row moment reduction
    "events_user_spearman": 4,
    # temporal split: 1-row bounds agg + split census (distinct expand)
    "events_temporal_split_embargo": 3,
    # PR-AUC / Heaps: bounded score-grain (resp. doc-grain) frames through
    # two chained bucketed cumsums each
    "doc_quality_pr_auc": 4,
    "vocab_heaps_fit": 4,
    # ESS inherits the DSIR unigram-LM pipeline's budget shape
    "docs_dsir_ess": 8,
    # RRF rides the same (doc,term,tf) feedstock as rank_overlap (15)
    "docs_rrf_fusion": 14,
    # trimmed mean: order-grain bucketed rank machinery
    "order_trimmed_mean": 4,
    # nDCG composes the fused ranking (14) + the BM25 reference list +
    # two bounded per-query gain aggs; every frame past the checkpointed
    # feedstock is |queries|-bounded
    "docs_ndcg_fused": 20,
    # McNemar: one map-only scan to a 1-row cell census
    "doc_quality_mcnemar": 1,
    # kappa: label-grain marginals (bounded |langs|) + 1-row reductions
    "doc_langid_kappa": 4,
    # Kaplan-Meier: user-grain t0/t1 aggs + the duration-day census; the
    # singleton-partition windows run over the calendar-bounded day frame
    "user_survival_km": 12,
    # CUPED: one checkpointed user-grain agg feeding pooled-moment and
    # per-arm consumers; SRM is one distinct-user census
    "events_ab_cuped": 2,
    "events_ab_srm_check": 2,
    # jackknife: one 32-block agg + 1-row broadcast + the 32-row moment
    # reductions; ratio CI is one user-grain agg + a 1-row reduction
    "order_mean_jackknife_ci": 4,
    "events_ratio_metric_ci": 2,
    # LSH planner: one bucket-grain shuffle + bounded config rollup
    "lsh_band_collision_stats": 3,
    # checkpointed (source, term) feedstock: census + top-k + rollup
    "docs_oov_rate": 3,
    # bounded cells + window reusing the final groupBy's partitioning
    "docs_l_diversity": 2,
    # one day-grain shuffle (checkpointed) + two 1-row reductions
    "events_mad_anomaly": 3,
    # bounded histogram agg + single-partition window over <= 11 bins
    "embeddings_dup_threshold_curve": 2,
    # 5 merge rounds x (vocab-grain census + scalar reduction), each on a
    # checkpointed word-type frame — the corpus shuffle happened once at
    # checkpoint time
    "bpe_train_merges": 11,
    # one Expand + hash aggregate for all three rollup grains
    "orders_rollup_revenue": 1,
    # checkpointed (source, bin) grid + source window + bounded CDF join
    "docs_quality_quantile_norm": 3,
    # per-type quartile agg + broadcast fences + outlier census
    "events_boxplot_stats": 2,
    # one corpus pass to per-source sufficient stats + bounded re-sums
    "source_loo_impact": 3,
    # checkpointed pane table; grid/window/rollup run on bounded frames,
    # plus the exact-side 6x explode harness (the cost the sketch saves)
    "events_hll_sliding_users": 6,
    # 4 FD candidates x (count-distinct expand + final + scalar reduce)
    "docs_fd_violations": 12,
    # label fixpoint feedstock + doc-grain join + cluster election agg
    "docs_quality_survivors": 4,
    # composes the two pair models (each separately pinned) + join/rollup
    "dedup_lsh_recall_report": 9,
    # checkpointed edge list + degree agg + two co-partitioned joins
    "parts_degree_assortativity": 5,
    # round 6: banded sign-LSH replaces the all-pairs theta join; the band
    # window/join/distinct/verify all run pre-checkpoint (the final frame
    # is a filter over the checkpointed scores — 0 visible exchanges)
    "dedup_embedding_cosine": 0,
    # recall harness: sample limit + band machinery + brute truth on the
    # 512-row sample + 4 scalar-agg crossJoins
    "dedup_embedding_lsh_recall": 11,
    # CDC audit: the TxnTable build runs as side jobs; the query result is
    # a 2-row local relation
    "txn_snapshot_diff": 0,
    # sign-LSH planner: corpus fan-out + bucket-grain agg + 8-row band agg
    "emb_lsh_band_stats": 3,
    # carries the trainer DAG (11, checkpoint-bounded) + one source agg
    "docs_bpe_token_counts": 12,
    # silhouette: post-checkpoint pair frame + a/b means + cell rollup
    "kmeans_silhouette_sample": 4,
    # funnel composes the minhash DAG (7) + quality stats + the hash
    # canonical agg + four scalar stage counts
    "docs_pipeline_funnel": 19,
    # one checkpointed shingle explode + vocab distinct + gram join +
    # 2-row split rollup
    "docs_ngram_novelty": 3,
    # rides the component-label fixpoint feedstock + (cluster, source)
    # agg + cluster-grain window + rollup join
    "docs_dedup_cluster_purity": 8,
    # LOO k-NN: post-checkpoint sample-grain window + vote/label aggs
    "embeddings_knn_label_accuracy": 2,
    # label feedstock + cluster sizes + corpus join + 2-row rollup
    "docs_quality_by_dup_status": 7,
}


def _shuffles(plan: str) -> int:
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "Reused" not in line
    )


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGETS))
def test_shuffle_budget(spark, sf_dir, name):
    plan = (
        Context(spark, sf_dir)
        .ref(name)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    got = _shuffles(plan)
    assert got <= SHUFFLE_BUDGETS[name], (
        f"{name}: {got} shuffles > budget {SHUFFLE_BUDGETS[name]}\n{plan}"
    )


@pytest.mark.parametrize(
    "name",
    [
        "doc_tfidf_terms",
        "docs_bm25_topk",
        "ann_cosine_topk",
        # TPC-H global top-k classics: Catalyst's rank-filter rewrite turns
        # the unpartitioned row_number + rank<=k into a TakeOrderedAndProject
        # (per-partition k-heap + k-row merge); a Spark-version or
        # query-shape regression would silently reintroduce the
        # single-partition global sort.
        "tpch_q03_shipping_priority",
        "tpch_q10_returned_items",
        "tpch_q18_large_volume_customer",
        # round-5 sampling primitives: the weighted draw must plan as
        # TakeOrderedAndProject, the per-group reservoir as WindowGroupLimit
        "docs_gumbel_topk",
        "docs_reservoir_per_source",
    ],
)
def test_topk_rank_filter_avoids_global_sort(spark, sf_dir, name):
    """rank <= k filters must plan as a running top-k — WindowGroupLimit
    (Spark 3.5 rank pushdown, partitioned windows) or TakeOrderedAndProject
    (unpartitioned rank-filter rewrite) — instead of fully sorting and
    materializing the window: the difference between top-k and global-sort
    cost at 100 TB."""
    plan = (
        Context(spark, sf_dir)
        .ref(name)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan, plan


# the offender walks live in the engine's audit API (plans/audit.py) so
# users get the same checks the CI invariant runs
from dbt_tpch_spark.plans.audit import (  # noqa: E402
    broadcast_hint_offenders as _broadcast_hint_offenders,
    pair_stage_offenders as _pair_stage_offenders,
    unpartitioned_window_offenders as _unpartitioned_window_offenders,
)


def test_no_scale_killer_plan_shapes(spark, sf_dir):
    """One sweep over every registered query, with ALL broadcast gates
    forced shut (the 100-TB-shaped plans), asserting both CI invariants:

    - no unpartitioned Window over an SF-linear or vocabulary-grain frame
      (the single-task window scale killer, round-3 verdict class);
    - no explicit ``F.broadcast`` hint on a key-grain frame (the hard-hint
      OOM class the round-4 verdict found in operators/graph.py — gated
      sites must route through _node_state/gated_broadcast, which this
      sweep closes, so any hint that survives is ungated by construction);
    - no Join without an equality conjunct where neither side is provably
      bounded (the all-pairs cartesian/theta scale killer, round-5
      verdict class — the shape the former brute-force
      dedup_embedding_cosine had).
    """
    import __spark_entry__ as entrymod
    import dbt_tpch_spark.functions as fx
    import dbt_tpch_spark.operators.graph as g

    saved = (fx.BROADCAST_STATE_MAX_ROWS, g.BROADCAST_STATE_MAX_NODES)
    fx.BROADCAST_STATE_MAX_ROWS = 0
    g.BROADCAST_STATE_MAX_NODES = 0
    offenders = {}
    try:
        for name, fn in entrymod.queries().items():
            df = fn(spark, sf_dir)
            bad = _unpartitioned_window_offenders(df)
            if bad:
                offenders[name] = ["window"] + bad
            hinted = _broadcast_hint_offenders(df)
            if hinted:
                offenders.setdefault(name, []).append(["broadcast"] + hinted)
            pairs = _pair_stage_offenders(df)
            if pairs:
                offenders.setdefault(name, []).append(["pair-stage"] + pairs)
    finally:
        fx.BROADCAST_STATE_MAX_ROWS, g.BROADCAST_STATE_MAX_NODES = saved
    assert not offenders, offenders


def test_broadcast_invariant_catches_hinted_key_grain_frame(spark, sf_dir):
    """The exact pre-fix shape from round 4 (graph.py:268): an explicit
    F.broadcast around a ``*_key``-grain aggregate must flag."""
    from pyspark.sql import functions as F

    c = Context(spark, sf_dir).source("customer")
    per_key = c.groupBy("c_custkey").agg(F.count("*").alias("n"))
    bad = c.join(
        F.broadcast(per_key.withColumnRenamed("n", "cnt")), "c_custkey"
    )
    assert _broadcast_hint_offenders(bad), "hinted key-grain frame not caught"
    # same join without the hint: planner/AQE-chosen broadcasts may demote
    # at scale, so only the hard hint flags
    ok = c.join(per_key.withColumnRenamed("n", "cnt"), "c_custkey")
    assert not _broadcast_hint_offenders(ok)
    # a hinted aggregate over a top-k-capped input is bounded: exempt
    capped = per_key.orderBy(F.col("n").desc()).limit(10)
    ok2 = c.join(F.broadcast(capped.withColumnRenamed("n", "cnt")), "c_custkey")
    assert not _broadcast_hint_offenders(ok2)


def test_pair_stage_invariant_catches_unbounded_theta_join(spark, sf_dir):
    """The exact pre-fix shape from round 5 (dedup_embedding_cosine): an
    all-pairs theta join over the raw corpus must flag; the same join over
    a GlobalLimit-bounded side, an id-prefix-filtered side, or a
    registered bounded checkpoint must pass."""
    from pyspark.sql import functions as F

    from dbt_tpch_spark.plans.audit import bounded_checkpoint

    e = Context(spark, sf_dir).source("embeddings").select("vec_id")
    a = e.withColumnRenamed("vec_id", "vec_a")
    b = e.withColumnRenamed("vec_id", "vec_b")
    bad = a.join(b, F.col("vec_a") < F.col("vec_b"))
    assert _pair_stage_offenders(bad), "unbounded theta pair join not caught"
    # unconditioned cross of two corpus frames flags too
    assert _pair_stage_offenders(a.crossJoin(b))
    # equi-join over the same frames: exempt (key-collision bounded)
    assert not _pair_stage_offenders(
        a.join(b, F.col("vec_a") == F.col("vec_b"))
    )
    # one side capped by a fixed-size sample: exempt
    capped = b.orderBy("vec_b").limit(16)
    assert not _pair_stage_offenders(
        a.join(capped, F.col("vec_a") < F.col("vec_b"))
    )
    # an UNREGISTERED literal prefix filter no longer exempts (round-6
    # ADVICE: the old regex accepted any ``col <= N`` without knowing N is
    # SF-independent) ...
    prefix = b.filter(F.col("vec_b") < 31)
    assert _pair_stage_offenders(
        a.join(prefix, F.col("vec_a") < F.col("vec_b"))
    ), "unregistered prefix filter must not bound"
    # ... but a predicate the engine DECLARED as a fixed sample does
    # (registered on the SOURCE column name: predicate pushdown rewrites
    # the filter below any rename-Project before the audit sees it)
    from dbt_tpch_spark.plans import audit as _audit
    from dbt_tpch_spark.plans.audit import register_bounded_filter

    # the registry is process-global (it exists so ENGINE modules can
    # declare fixed samples at import time); a test registration must not
    # leak the exemption into every later plan walked in this session
    # (round-7 ADVICE) — snapshot and restore around the assertion.
    snapshot = set(_audit._BOUNDED_FILTER_PREDS)
    try:
        register_bounded_filter("vec_id < 31")
        assert not _pair_stage_offenders(
            a.join(prefix, F.col("vec_a") < F.col("vec_b"))
        )
    finally:
        _audit._BOUNDED_FILTER_PREDS.clear()
        _audit._BOUNDED_FILTER_PREDS.update(snapshot)
    # with the registration rolled back, the same shape flags again
    assert _pair_stage_offenders(
        a.join(prefix, F.col("vec_a") < F.col("vec_b"))
    ), "test-scoped registration leaked into the global registry"
    # a checkpoint erases the cap's provenance: flags again ...
    opaque = capped.localCheckpoint(eager=True)
    assert _pair_stage_offenders(
        a.join(opaque, F.col("vec_a") < F.col("vec_b"))
    )
    # ... unless the engine registered it as bounded
    registered = bounded_checkpoint(b.orderBy("vec_b").limit(16))
    assert not _pair_stage_offenders(
        a.join(registered, F.col("vec_a") < F.col("vec_b"))
    )


def test_window_invariant_flags_vocab_grain(spark, sf_dir):
    """Round-4 verdict watch item: a window over a TERM-grain aggregate
    (vocabulary cardinality — corpus-growing under Heaps' law) must flag
    as unbounded, same as entity-key grains."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    d = Context(spark, sf_dir).source("documents")
    terms = (
        d.select(F.explode(F.split("text", r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    ranked = terms.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("tf").desc()))
    )
    assert _unpartitioned_window_offenders(ranked), (
        "term-grain unpartitioned window not caught"
    )


def test_pair_stage_boundedness_closes_round6_advice_holes(spark, sf_dir):
    """The three false-pass holes the round-6 ADVICE found in
    _subtree_bounded / pair_stage_offenders, each as the exact shape that
    used to slip through:

    1. an Aggregate grouped on a CONTINUOUS column (SF-linear NDV) above a
       theta join used to count as bounded (the old blacklist only knew
       *key/*id/vocab grains);
    2. a bounded leaf BELOW a corpus-sized join used to bound the whole
       subtree (the old walk scanned every descendant);
    3. a ``' = '`` substring inside a nested CaseWhen / NOT(=) used to
       read as an equality conjunct (now detected structurally)."""
    from pyspark.sql import functions as F

    e = Context(spark, sf_dir).source("embeddings").select("vec_id")
    emb = Context(spark, sf_dir).source("embeddings")
    a = e.withColumnRenamed("vec_id", "vec_a")
    b = e.withColumnRenamed("vec_id", "vec_b")

    # 1. continuous-double grain is NOT a bounded domain: the aggregate's
    # NDV grows with SF, so a theta join against it must flag
    cont = (
        emb.select((F.col("vec_id") * 1.00001).alias("score"))
        .groupBy("score")
        .agg(F.count("*").alias("n"))
    )
    assert _pair_stage_offenders(
        a.join(cont, F.col("vec_a") < F.col("score"))
    ), "continuous-grain aggregate must not bound a pair join"

    # 2. a GlobalLimit below a corpus-multiplying join does not bound the
    # join's output: corpus x corpus with a capped side GLUED UNDER one
    # side via a third join must still flag
    capped = b.orderBy("vec_b").limit(4)
    fat = a.crossJoin(capped.withColumnRenamed("vec_b", "vec_c"))
    assert _pair_stage_offenders(
        fat.join(b, F.col("vec_a") < F.col("vec_b"))
    ), "bounded leaf below a join must not bound the subtree root"

    # 3. equality text inside a non-equality condition is not an equality
    # conjunct: NOT(a = b) and a CaseWhen containing '=' must both flag
    assert _pair_stage_offenders(
        a.join(b, ~(F.col("vec_a") == F.col("vec_b")))
    ), "NOT(=) must not read as an equality conjunct"
    nested = a.join(
        b,
        F.when(F.col("vec_a") % 2 == 0, F.col("vec_a")).otherwise(
            F.lit(0)
        )
        < F.col("vec_b"),
    )
    assert _pair_stage_offenders(
        nested
    ), "CaseWhen '=' text must not read as an equality conjunct"

    # sanity: a join of two BOUNDED sides (scalar aggregates crossed) is
    # bounded even though the bounding node is a Join
    tot_a = a.agg(F.count("*").alias("na"))
    tot_b = b.agg(F.count("*").alias("nb"))
    totals = tot_a.crossJoin(tot_b)
    assert not _pair_stage_offenders(
        a.crossJoin(totals)
    ), "a cross of two scalar aggregates is bounded"


def test_window_invariant_flags_continuous_double_grain(spark, sf_dir):
    """The window walk's grain read is TYPE-aware: an unpartitioned window
    over an aggregate grouped on a continuous double (SF-linear NDV, name
    matching no blacklist) must flag, while a double grain whose NAME
    vouches for a fixed quantization (bin/threshold/decile) passes — the
    same precision treatment the pair-stage walk got for round-6 ADVICE."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    c = Context(spark, sf_dir).source("customer")
    cont = (
        c.select((F.col("c_acctbal") * 1.000001).alias("score"))
        .groupBy("score")
        .agg(F.count("*").alias("n"))
    )
    ranked = cont.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("n").desc()))
    )
    assert _unpartitioned_window_offenders(ranked), (
        "continuous-double grain under an unpartitioned window not caught"
    )
    binned = (
        c.select((F.floor(F.col("c_acctbal")) / F.lit(100.0)).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )
    ranked_ok = binned.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("n").desc()))
    )
    assert not _unpartitioned_window_offenders(ranked_ok)


def test_broadcast_invariant_flags_vocab_grain_hint(spark, sf_dir):
    """Round-6 verdict #7: a hard ``F.broadcast`` hint on a vocabulary-
    grain aggregate (distinct grams/terms) must flag — vocab cardinality
    grows with the corpus under Heaps' law, so the hint is the same
    guaranteed-OOM class as a key-grain broadcast, just on a slower
    curve. The hint-free join passes (AQE decides by measured size)."""
    from pyspark.sql import functions as F

    d = Context(spark, sf_dir).source("documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    grams = toks.groupBy("term").agg(F.count("*").alias("df"))
    hinted = toks.join(F.broadcast(grams), "term")
    assert _broadcast_hint_offenders(hinted), (
        "hinted vocab-grain broadcast not caught"
    )
    assert not _broadcast_hint_offenders(toks.join(grams, "term"))


def test_pagerank_copartition_mode_has_no_state_broadcast(spark, sf_dir):
    """Above BROADCAST_STATE_MAX_NODES the per-round rank state must NOT be
    broadcast (SF1000: ~200M rows/round); the edge side stays partitioned
    on src and only node-sized state moves. The per-round plans live behind
    localCheckpoint barriers, so capture them at checkpoint time."""
    try:  # pyspark 4: the concrete class lives in sql.classic
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame

    import dbt_tpch_spark.operators.graph as g

    saved = g.BROADCAST_STATE_MAX_NODES
    real_ckpt = DataFrame.localCheckpoint
    captured = []

    def spy(self, eager=True):
        captured.append(self._jdf.queryExecution().executedPlan().toString())
        return real_ckpt(self, eager=eager)

    g.BROADCAST_STATE_MAX_NODES = 0
    DataFrame.localCheckpoint = spy
    try:
        df = Context(spark, sf_dir).ref("parts_pagerank")
    finally:
        DataFrame.localCheckpoint = real_ckpt
        g.BROADCAST_STATE_MAX_NODES = saved
    # pr-init + one per iteration (edges are cached, not checkpointed)
    assert len(captured) >= 1 + g.ITERS
    import re

    for plan in captured:
        assert "BroadcastExchange" not in plan, plan
        # the cached edge table must be consumed as-is: no round may insert
        # an ENSURE_REQUIREMENTS re-shuffle on the single src key (the
        # REPARTITION_BY_NUM inside the InMemoryRelation build plan is the
        # one-time cache fill, not a per-round cost)
        assert not re.search(
            r"Exchange hashpartitioning\(src#\d+L, \d+\), ENSURE_REQUIREMENTS",
            plan,
        ), plan
    assert df.count() > 0


def test_graph_state_modes_produce_identical_output(spark, sf_dir):
    """VERDICT r7 #5: the copartition-mode test above asserts PLAN shape
    only; the broadcast-state and shuffle-hash-state code paths must also
    be VALUE-identical — both paths quantize ranks/core numbers the same
    way, so the full output tables must match row for row, not just both
    come back green."""
    import dbt_tpch_spark.operators.graph as g

    for name, key in (("parts_pagerank", "part_key"), ("parts_kcore", "part_key")):
        cols = None
        outputs = []
        saved = g.BROADCAST_STATE_MAX_NODES
        for forced in (saved, 0):
            g.BROADCAST_STATE_MAX_NODES = forced
            try:
                df = Context(spark, sf_dir).ref(name)
                cols = df.columns
                outputs.append(sorted(map(tuple, df.collect())))
            finally:
                g.BROADCAST_STATE_MAX_NODES = saved
        assert outputs[0], f"{name}: empty output cannot witness equality"
        assert outputs[0] == outputs[1], (
            f"{name}: broadcast-state vs shuffle-hash-state outputs differ "
            f"(columns {cols})"
        )


def test_q1_scan_prunes_and_pushes(spark, sf_dir):
    """The flagship Q1 plan must show column pruning and filter pushdown at
    the scan: lineitem reads only the 8 needed of 11 columns, orders
    collapses to its single join key, and the 90-day date filter reaches
    the parquet reader as a data filter."""
    plan = (
        Context(spark, sf_dir)
        .ref("rpt_pricing_summary")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [line for line in plan.splitlines() if "FileScan parquet" in line]
    lineitem = next(s for s in scans if "lineitem" in s)
    orders = next(s for s in scans if "orders.parquet" in s)
    assert "l_shipdate" in lineitem and "l_comment" not in lineitem
    assert lineitem.split("FileScan parquet [")[1].split("]")[0].count(",") == 7
    assert orders.split("FileScan parquet [")[1].split("]")[0] == "o_orderkey#" + (
        orders.split("o_orderkey#")[1].split("L")[0]
    ) + "L"
    assert "l_shipdate" in lineitem.split("DataFilters: [")[1].split("]")[0]
