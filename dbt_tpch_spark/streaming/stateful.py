"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for semantics Spark's built-in windows can't express
(SURVEY §7.1 step 7; the reference has no streaming at all, SURVEY §2.10).

The operator keeps per-user running state across micro-batches: event count,
exact value sum (integer-cents arithmetic so state is order-stable), max
inter-event gap, and first/last event times. With an ``availableNow`` run
over a static file the emitted final state must equal the batch groupBy —
which is exactly what tests/test_streaming.py asserts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value_cents long, "
    "max_gap_seconds double, first_ts timestamp, last_ts timestamp"
)
STATE_SCHEMA = (
    "n long, cents long, max_gap double, first_us long, last_us long"
)


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch of one user's events into running state and
    emit the refreshed totals (update semantics)."""
    (user_id,) = key
    if state.exists:
        n, cents, max_gap, first_us, last_us = state.get
    else:
        n, cents, max_gap, first_us, last_us = 0, 0, 0.0, None, None

    for pdf in batches:
        pdf = pdf.sort_values("ts")
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()  # ns -> us
        # per-row integer cents: deterministic accumulation across batches
        # (matches the batch twin's per-row round-then-sum)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        n += len(pdf)
        for t in ts_us:
            if last_us is not None:
                max_gap = max(max_gap, (t - last_us) / 1e6)
            if first_us is None:
                first_us = t
            last_us = max(last_us, t) if last_us is not None else t

    state.update((n, cents, max_gap, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value_cents": [cents],
            "max_gap_seconds": [max_gap],
            "first_ts": [pd.Timestamp(first_us, unit="us")],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def streaming_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful per-user running stats over the events stream."""
    from dbt_tpch_spark.streaming.windows import read_events_stream

    e = read_events_stream(spark, sf_dir)
    return e.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming_user_stats (ground truth for tests)."""
    from dbt_tpch_spark.sources import read_table
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn(
        "gap_s",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) / 1e6,
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "approx_total_value_cents"
        ),
        F.coalesce(F.max("gap_s"), F.lit(0.0)).alias("max_gap_seconds"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas twin (Spark 4's arbitrary-stateful-operator API)
# --------------------------------------------------------------------------


def tws_support() -> tuple[bool, str]:
    """Runtime probe for the transformWithStateInPandas path (VERDICT r9
    #7): the API landed in Spark 4.0 and its Python worker speaks protobuf
    to the state server. Returns ``(available, reason)`` so the
    equivalence test runs on a capable session and SKIPS WITH THE PROBE'S
    REASON otherwise — the path can't silently rot when the session Spark
    version moves in either direction."""
    import pyspark

    version = pyspark.__version__
    try:
        major = int(version.split(".")[0])
    except ValueError:
        return False, f"unparseable pyspark version {version!r}"
    if major < 4:
        return False, (
            f"transformWithStateInPandas needs Spark >= 4.0 "
            f"(session runs {version})"
        )
    if StatefulProcessor is None:
        return False, (
            f"Spark {version} lacks pyspark.sql.streaming.stateful_processor"
        )
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False, (
            "python 'protobuf' package absent (the operator's state-server "
            "protocol needs it; no pip install in this container)"
        )
    return True, f"Spark {version} + protobuf present"


try:
    from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # Spark < 4.0: keep the module importable; the probe
    StatefulProcessor = None  # above reports the reason and tests skip
    StatefulProcessorHandle = None

# subclassing None is a TypeError — give the processor an inert base on
# sessions without the API (it is only instantiated behind tws_support())
_TWS_BASE = StatefulProcessor if StatefulProcessor is not None else object


class UserStatsProcessor(_TWS_BASE):
    """transformWithState port of ``_update_user_state``: identical fold,
    but state lives in a named ValueState on the new operator's state store
    (RocksDB-backed in a cluster deployment, with TTL/timers available —
    the API Spark 4 positions as the applyInPandasWithState successor).

    Runtime gate: the operator's Python worker speaks protobuf to the state
    server; this container has no ``protobuf`` package, so the equivalence
    test skips (tests/test_streaming.py) and the applyInPandasWithState
    operator above remains the tested deployment path here."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        if self._stats.exists():
            n, cents, max_gap, first_us, last_us = self._stats.get()
        else:
            n, cents, max_gap, first_us, last_us = 0, 0, 0.0, None, None
        for pdf in rows:
            pdf = pdf.sort_values("ts")
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
            n += len(pdf)
            for t in ts_us:
                if last_us is not None:
                    max_gap = max(max_gap, (t - last_us) / 1e6)
                if first_us is None:
                    first_us = t
                last_us = max(last_us, t) if last_us is not None else t
        self._stats.update((n, cents, max_gap, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value_cents": [cents],
                "max_gap_seconds": [max_gap],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_stats_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_user_stats on the transformWithStateInPandas API; must
    emit the same final state (asserted against the batch twin in tests)."""
    from dbt_tpch_spark.streaming.windows import read_events_stream

    # transformWithState is only implemented on the RocksDB state store
    # (session-level conf, read at query start; the older operators run on
    # either provider)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    e = read_events_stream(spark, sf_dir)
    return e.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
