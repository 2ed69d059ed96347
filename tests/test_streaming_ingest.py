"""Streaming twin of the incremental-ingest dedup: incoming documents
arrive as micro-batches (file stream, one file per trigger), each batch's
verdicts are computed against the SAME standing index via the shared
:func:`ingest_verdicts` core inside foreachBatch, and the union of the
streamed verdicts must equal the batch model's output row-for-row —
the property that makes per-ingest dedup composable (a verdict depends
only on the document and the index, never on batch-mates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.parity import canonicalize
from dbt_tpch_spark.plans import Context, import_all_models
from dbt_tpch_spark.operators.dedup import INGEST_MOD, ingest_verdicts

import_all_models()


def test_streamed_ingest_verdicts_equal_batch_model(spark, sf_dir, tmp_path):
    ctx = Context(spark, sf_dir)
    docs = ctx.source("documents").select("doc_id", "source", "text")
    is_incoming = (F.col("doc_id") % INGEST_MOD) == 0
    index_docs = docs.filter(~is_incoming)

    # incoming batch as 3 files -> 3 micro-batches under availableNow
    in_dir = str(tmp_path / "incoming")
    docs.filter(is_incoming).repartition(3).write.parquet(in_dir)
    out_dir = str(tmp_path / "verdicts")

    stream = spark.readStream.schema(
        "doc_id long, source string, text string"
    ).option("maxFilesPerTrigger", "1").parquet(in_dir)

    def sink(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        ingest_verdicts(batch_df, index_docs).write.mode("append").parquet(
            out_dir
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = canonicalize(spark.read.parquet(out_dir).toPandas())
    batch = canonicalize(ctx.ref("dedup_incremental_ingest").toPandas())
    assert len(streamed) == len(batch) > 0
    assert streamed.equals(batch)


def test_streamed_hll_panes_fold_to_batch_panes(spark, sf_dir, tmp_path):
    """Streaming maintenance of the HLL pane table: events arrive as
    micro-batches, each batch's panes are APPENDED to a pane log (no
    read-modify-write needed), and the log folded by register max must
    equal the panes built from the whole corpus in one pass — register
    max is associative/commutative, so the pane table is maintainable by
    a blind foreachBatch append at any scale. The sliding estimates are a
    pure function of the pane table, so pane equality IS estimate
    equality."""
    from dbt_tpch_spark.operators.sketches import hll_hour_panes

    ctx = Context(spark, sf_dir)
    events = ctx.source("events").select("ts", "user_id")

    in_dir = str(tmp_path / "incoming")
    events.repartition(3).write.parquet(in_dir)
    out_dir = str(tmp_path / "panes")

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )

    def sink(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        hll_hour_panes(batch_df).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    folded = canonicalize(
        spark.read.parquet(out_dir)
        .groupBy("hour_idx", "bucket")
        .agg(F.max("m_j").alias("m_j"))
        .toPandas()
    )
    batch = canonicalize(hll_hour_panes(events).toPandas())
    assert len(folded) == len(batch) > 0
    assert folded.equals(batch)
