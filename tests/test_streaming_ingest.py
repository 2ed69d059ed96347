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


def test_streamed_growing_index_incremental_dedup(spark, sf_dir, tmp_path):
    """The full production wiring of incremental MinHash dedup (round 9):
    documents STREAM in as micro-batches; each foreachBatch invocation runs
    :func:`incremental_dedup_batch` against the PERSISTED TxnTable band
    index (every prior batch's commits) and then appends its own band rows
    — so later micro-batches dedup against earlier ones, unlike the
    static-index test above. The streamed union of verified pairs must
    equal one full-LSH run on the final corpus (unordered-pair set), and
    the index must end with one TxnTable version per non-empty batch."""
    import dbt_tpch_spark.operators.dedup as dd
    from dbt_tpch_spark.tableformat import TxnTable

    ctx = Context(spark, sf_dir)
    docs = ctx.source("documents").select("doc_id", "text")

    in_dir = str(tmp_path / "incoming")
    docs.repartition(3).write.parquet(in_dir)
    pairs_dir = str(tmp_path / "pairs")
    index_path = str(tmp_path / "band_index")
    store_path = str(tmp_path / "doc_store")

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(in_dir)

    state = {"table": None}

    def sink(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        # the document store a deployment reads verify-side texts from:
        # everything ingested so far, this batch included
        batch_df.write.mode("append").parquet(store_path)
        table = state["table"]
        history = (
            table.read()
            if table is not None
            else dd.lsh_band_rows(batch_df, n_parts=8).limit(0)
        )
        all_docs = spark.read.parquet(store_path)
        verified, inc_bands = dd.incremental_dedup_batch(
            batch_df, history, all_docs, n_parts=8
        )
        verified.write.mode("append").parquet(pairs_dir)
        if table is None:
            state["table"] = TxnTable.create(spark, index_path, inc_bands)
        else:
            table.append(inc_bands)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (min(r["doc_inc"], r["doc_other"]), max(r["doc_inc"], r["doc_other"]))
        for r in spark.read.parquet(pairs_dir).collect()
    }
    full = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in ctx.ref("dedup_minhash_lsh").collect()
    }
    assert got == full and len(full) > 0
    n_batches = len(state["table"].versions())
    assert n_batches >= 2  # maxFilesPerTrigger=1 over 3 files
    assert (
        state["table"].read().count()
        == dd.lsh_band_rows(docs, n_parts=8).count()
    )
