"""SparkSession factory tuned for the engine.

Local test posture is ``local[$SPARK_GRAFT_CPUS]``; the same settings are the
ones we would ship for a multi-executor cluster (AQE on, adaptive partition
coalescing, broadcast threshold) — only memory/shuffle sizing changes with
scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "dbt-tpch-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # UTC so timestamp->date casts agree with the (timezone-naive) DuckDB
        # oracle regardless of host timezone.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing of small shuffle partitions, dynamic
        # broadcast conversion, and skew-join splitting — all required at the
        # 100 TB posture and harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Arrow for any pandas_udf / toPandas path (extension operators).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # keep every stage's metrics in the app status store for the whole
        # run: bench.py reads per-query executor CPU as a stage-sum delta,
        # and the default 1000-stage retention would evict early stages
        # mid-bench, corrupting the deltas
        .config("spark.ui.retainedStages", "50000")
    )
    spark = builder.getOrCreate()
    _quiet_benign_window_warnings(spark)
    return spark


def _quiet_benign_window_warnings(spark: SparkSession) -> None:
    """Silence WindowExec's "No Partition Defined" WARN.

    Every unpartitioned window left in the engine runs over a
    post-aggregation (report-cardinality) frame — a CI invariant walks all
    query plans and rejects any unpartitioned Window over non-aggregated
    input (tests/test_plan_budgets.py::test_no_unpartitioned_window_over_raw_data)
    — so the per-batch WARN is pure noise that drowns bench logs. Scoped to
    the one logger; every other WARN still surfaces."""
    try:
        jvm = spark._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:  # non-log4j2 deployments: keep the warning
        pass
