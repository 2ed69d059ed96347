"""Physical table layout for the 100 TB posture (SURVEY §4.4):

* **date-partitioned facts** — `write_partitioned` lays facts out by month
  so date filters become partition pruning at the scan (verified in
  tests/test_warehouse.py via the plan's partition filters);
* **bucketed tables** — `write_bucketed` pre-shuffles a table on its join
  key so repeated key-joins are exchange-free (the engine's equivalent of
  the reference's CTAS table boundaries, which DuckDB re-sorts internally).

Both produce ordinary catalog tables readable by name; the model registry's
``table_policy='parquet'`` covers the simple unpartitioned case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    source_col: str | None = None,
    granularity: str = "month",
) -> None:
    """Write parquet partitioned by a time bucket of ``source_col`` (e.g.
    order month). The partition column is a plain string (e.g. '1998-01')
    so directory names stay portable."""
    if source_col is not None:
        df = df.withColumn(
            partition_col,
            F.date_format(F.date_trunc(granularity, F.col(source_col)), "yyyy-MM"),
        )
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    spark: SparkSession,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
) -> None:
    """Persist as a bucketed catalog table: co-locates rows by hash of the
    join key so subsequent equi-joins between tables bucketed the same way
    need no shuffle exchange."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )
