"""Behavioral tests for the extension operators (parity is covered by
test_parity; these check operator-specific invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.plans import Context, import_all_models

import_all_models()


def test_minhash_lsh_recall_against_exact(spark, sf_dir):
    """Every LSH-verified pair must be a true >=0.5 shingle-Jaccard pair
    (precision 1.0 by construction — verified candidates only)."""
    ctx = Context(spark, sf_dir)
    lsh = ctx.ref("dedup_minhash_lsh").select("doc_a", "doc_b", "jaccard")
    assert lsh.filter(F.col("jaccard") < 0.5).count() == 0
    n_lsh = lsh.count()
    assert n_lsh > 0


def test_simhash_hamming_bounds(spark, sf_dir):
    ctx = Context(spark, sf_dir)
    sigs = ctx.ref("dedup_simhash_signatures")
    row = sigs.select(F.length("sig_bits").alias("l")).distinct().collect()
    assert [r.l for r in row] == [64]
    pairs = ctx.ref("dedup_simhash_pairs")
    bad = pairs.filter((F.col("hamming_distance") < 0) | (F.col("hamming_distance") > 16))
    assert bad.count() == 0


def test_ann_topk_is_ranked(spark, sf_dir):
    ctx = Context(spark, sf_dir)
    topk = ctx.ref("ann_cosine_topk")
    # exactly 10 queries, each with <= 10 ranked neighbors, rank unique per query
    per_q = topk.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("rank").alias("nr")
    )
    assert per_q.filter((F.col("n") > 10) | (F.col("n") != F.col("nr"))).count() == 0
    # cosine must be non-increasing with rank within a query
    w_bad = topk.alias("a").join(
        topk.alias("b"),
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.rank") < F.col("b.rank"))
        & (F.col("a.cosine") < F.col("b.cosine")),
    )
    assert w_bad.count() == 0


def test_multimodal_plumbing_batch_shape(spark, sf_dir):
    ctx = Context(spark, sf_dir)
    out = ctx.ref("multimodal_metadata")
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,byte_len:bigint,content_md5:string,"
        "width:bigint,height:bigint,channels:bigint,decode_status:string>"
    )
    n_docs = ctx.source("documents").count()
    assert out.count() == n_docs
    assert out.filter(F.col("decode_status") != "stub_decoder").count() == 0


def test_text_quality_score_range(spark, sf_dir):
    ctx = Context(spark, sf_dir)
    stats = ctx.ref("doc_text_stats")
    out_of_range = stats.filter(
        (F.col("quality_score") < 0) | (F.col("quality_score") > 1.0)
    )
    assert out_of_range.count() == 0


def test_sketch_aggregates_accuracy(spark, sf_dir):
    """Approximate aggregates (the 100 TB path where exact distinct counts
    and percentiles are too expensive): HLL++ and KLL-style sketches must
    land within their documented error of the exact answers."""
    ctx = Context(spark, sf_dir)
    o = ctx.ref("fct_orders")
    row = o.agg(
        F.countDistinct("customer_key").alias("exact_cd"),
        F.approx_count_distinct("customer_key", rsd=0.02).alias("approx_cd"),
        F.expr("percentile(gross_item_sales_amount, 0.5)").alias("exact_p50"),
        F.expr(
            "approx_percentile(gross_item_sales_amount, 0.5, 10000)"
        ).alias("approx_p50"),
    ).collect()[0]
    assert abs(row.approx_cd - row.exact_cd) <= 0.05 * row.exact_cd
    assert abs(row.approx_p50 - row.exact_p50) <= 0.05 * abs(row.exact_p50)


def test_pandas_udf_cosine_agrees_with_jvm_expression(spark, sf_dir):
    """The Arrow-vectorized cosine must agree with the exact-decimal JVM
    expression to float tolerance (different summation schemes: einsum
    pairwise vs exact decimal — not bit-identical by design)."""
    from dbt_tpch_spark.operators.dedup import DOT_SPARK
    from dbt_tpch_spark.operators.similarity import cosine_pandas_udf
    from dbt_tpch_spark.sources import read_table

    e = read_table(spark, sf_dir, "embeddings").limit(50)
    a = e.selectExpr("vec_id AS va", "embedding AS ea")
    b = e.selectExpr("vec_id AS vb", "embedding AS eb")
    pairs = a.join(b, F.col("va") < F.col("vb"))
    jvm = F.expr(DOT_SPARK.format(a="ea", b="eb")) / (
        F.sqrt(F.expr(DOT_SPARK.format(a="ea", b="ea")))
        * F.sqrt(F.expr(DOT_SPARK.format(a="eb", b="eb")))
    )
    cos_udf = cosine_pandas_udf()
    out = pairs.select(
        jvm.alias("jvm"), cos_udf(F.col("ea"), F.col("eb")).alias("arrow")
    )
    bad = out.filter(F.abs(F.col("jvm") - F.col("arrow")) > 1e-9)
    assert bad.count() == 0
    assert out.count() == 50 * 49 // 2


def test_asof_join_invariants_and_plan(spark, sf_dir):
    """As-of semantics: click at-or-before the anchor (gap_us >= 0), and the
    physical plan must contain no join at all — the union+window form's
    whole point is replacing a theta join (BroadcastNestedLoopJoin) with
    one shuffle."""
    ctx = Context(spark, sf_dir)
    out = ctx.ref("events_asof_last_click")
    assert out.filter(F.col("gap_us") < 0).count() == 0
    n_errors = ctx.source("events").filter(F.col("event_type") == "error").count()
    assert out.count() == n_errors
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_range_context_matches_naive_and_avoids_nlj(spark, sf_dir):
    """The bucketed range join must equal the naive theta-join result and
    must plan as an equi-join (no BroadcastNestedLoopJoin / cartesian)."""
    ctx = Context(spark, sf_dir)
    out = ctx.ref("events_range_context")
    e = ctx.source("events")
    anchors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"), F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    naive = (
        anchors.join(
            e,
            (F.col("user_id") == F.col("a_user"))
            & (F.col("ts") >= F.col("a_ts") - F.expr("INTERVAL 300 SECONDS"))
            & (F.col("ts") < F.col("a_ts")),
            "left",
        )
        .groupBy("a_id")
        .agg(F.count("event_id").alias("n_naive"))
    )
    diff = (
        out.join(naive, out.event_id == naive.a_id)
        .filter(F.col("n_context") != F.col("n_naive"))
        .count()
    )
    assert diff == 0
    assert out.count() == anchors.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Cartesian" not in plan, plan
