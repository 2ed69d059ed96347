"""Semantic invariants for the late-round-3 operators — properties the
oracle hash parity cannot express (parity proves both engines agree; these
prove the agreed answer has the right shape): credit conservation,
non-negativity, redaction completeness, suppression consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.plans import Context, import_all_models

import_all_models()


def test_psi_is_nonnegative(spark, sf_dir):
    rows = Context(spark, sf_dir).ref("events_value_psi").collect()
    assert rows
    for r in rows:
        assert r["psi"] is not None and r["psi"] >= 0.0, r


def test_redaction_leaves_no_digits(spark, sf_dir):
    df = Context(spark, sf_dir).ref("events_props_redaction")
    leaked = df.filter(F.col("redacted_props").rlike("[0-9]")).count()
    assert leaked == 0
    # the number branch is actually exercised on this corpus
    assert df.filter(F.col("n_number") > 0).count() > 0


def test_audio_energy_bounds_and_sample_conservation(spark, sf_dir):
    ctx = Context(spark, sf_dir)
    frames = ctx.ref("multimodal_audio_energy")
    bad = frames.filter(
        (F.col("energy") < 0)
        | (F.col("peak") < 0)
        | (F.col("peak") >= 32768)
        | (F.col("n_frame_samples") <= 0)
    ).count()
    assert bad == 0
    # per-doc frame samples must reassemble to len(utf8(text)) // 2
    per_doc = frames.groupBy("doc_id").agg(
        F.sum("n_frame_samples").alias("n_samples")
    )
    docs = ctx.source("documents").select(
        "doc_id",
        (F.length(F.encode(F.col("text"), "utf-8")) / 2)
        .cast("long")
        .alias("expect"),
    )
    mism = (
        per_doc.join(docs, "doc_id")
        .filter(F.col("n_samples") != F.col("expect"))
        .count()
    )
    assert mism == 0


def test_multitouch_credit_is_conserved(spark, sf_dir):
    """Linear attribution must neither mint nor destroy revenue: channel
    credits (including the unattributed bucket) sum to total purchase
    value, within the documented 9-dp per-credit quantization."""
    ctx = Context(spark, sf_dir)
    report = ctx.ref("events_attribution_multitouch")
    credited = sum(r["credited_value"] for r in report.collect())
    total = (
        ctx.source("events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .first()[0]
    )
    assert abs(credited - total) < 1e-3, (credited, total)


def test_kanon_suppression_is_consistent(spark, sf_dir):
    rows = Context(spark, sf_dir).ref("customer_kanon_report").collect()
    from dbt_tpch_spark.models.extended import KANON_K

    assert rows
    for r in rows:
        if r["suppressed"]:
            assert r["n_customers"] < KANON_K
            assert r["avg_balance"] is None and r["total_balance"] is None
        else:
            assert r["n_customers"] >= KANON_K
            assert r["avg_balance"] is not None


def test_incremental_ingest_verdicts_cover_the_batch(spark, sf_dir):
    from dbt_tpch_spark.operators.dedup import INGEST_MOD

    ctx = Context(spark, sf_dir)
    out = ctx.ref("dedup_incremental_ingest")
    n_batch = (
        ctx.source("documents")
        .filter((F.col("doc_id") % INGEST_MOD) == 0)
        .count()
    )
    assert out.count() == n_batch
    # is_new XOR has-a-match, row by row
    bad = out.filter(
        (F.col("is_new") & F.col("best_match_doc").isNotNull())
        | (~F.col("is_new") & F.col("best_match_doc").isNull())
    ).count()
    assert bad == 0
