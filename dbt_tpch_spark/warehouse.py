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

#: cap on the driver-side distinct-partition collect in
#: write_insert_overwrite (≈27 years of daily partitions; a legitimate
#: date/month grain never approaches it, a mistaken key column blows
#: straight past it)
MAX_OVERWRITE_PARTITIONS = 10_000


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


# --------------------------------------------------------------------------
# full-DAG warehouse build (dbt's threads-N scheduler equivalent)
# --------------------------------------------------------------------------


def _topo_levels(targets: set[str]) -> list[list[str]]:
    """Topological levels of the model DAG restricted to ``targets``, using
    the dependency edges declared in the oracle registry (same DAG as the
    Spark side)."""
    from dbt_tpch_spark.models.oracle import ORACLE

    def table_deps(name: str, seen: set[str]) -> set[str]:
        out: set[str] = set()
        for d in ORACLE.get(name, ((), ""))[0]:
            if d in seen:
                continue
            seen.add(d)
            if d in targets:
                out.add(d)
            else:
                out |= table_deps(d, seen)
        return out

    deps = {n: table_deps(n, set()) for n in targets}
    levels: list[list[str]] = []
    remaining = dict(deps)
    while remaining:
        ready = sorted(n for n, ds in remaining.items() if not ds & set(remaining))
        if not ready:
            raise ValueError(f"dependency cycle among {sorted(remaining)}")
        levels.append(ready)
        for n in ready:
            del remaining[n]
    return levels


def build_warehouse(
    spark: SparkSession,
    sf_dir: str,
    warehouse_dir: str,
    parallelism: int = 4,
    layers: tuple[str, ...] = ("ods", "wh", "metrics", "reports"),
    timings: dict | None = None,
    cost_hint: dict[str, float] | None = None,
) -> dict[str, str]:
    """Materialize every table-model of the given layers to parquet,
    level-by-level (downstream levels read the written artifacts, exactly
    like dbt's CTAS boundaries), with ``parallelism`` concurrent writes per
    level (dbt's ``threads: 4`` — reference profiles.yml:8).

    Spark's scheduler accepts concurrent job submission from threads; each
    write is an independent job so executors stay busy across models.
    Returns {model: artifact_path}.

    ``timings`` (VERDICT r9 #5): pass a dict to receive the build's wall
    decomposition — ``timings["tables"][model]`` is the per-table wall
    (plan + write, INCLUDING scheduler contention from the other
    ``parallelism-1`` concurrent writes of its level) and
    ``timings["levels"]`` the serial per-level walls that sum to the
    total. This is what makes a cross-round full-DAG drift attributable
    to a table instead of a mystery.

    ``cost_hint`` (round-10 DAG-drift adjudication): optional
    {model: prior wall seconds}. Each level dispatches
    longest-known-first (LPT packing — within 4/3 of the optimal
    makespan for the ``parallelism``-lane schedule), so a handful of
    ~5-9 s window-family tables can't land in one lane late and stretch
    the level by their sum. Unknown tables run first (they might be
    big). Without hints, dispatch order is the topo level's sorted
    order, as before.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    from dbt_tpch_spark.plans import MODELS, Context

    ctx = Context(spark, sf_dir)
    targets = {
        n
        for n, s in MODELS.items()
        if s.materialization == "table" and s.layer in layers
    }
    paths: dict[str, str] = {}

    def write(name: str) -> None:
        t0 = time.perf_counter()
        df = MODELS[name].fn(ctx)
        path = f"{warehouse_dir}/{name}"
        df.write.mode("overwrite").parquet(path)
        paths[name] = path
        if timings is not None:
            timings.setdefault("tables", {})[name] = round(
                time.perf_counter() - t0, 3
            )

    for level in _topo_levels(targets):
        if cost_hint:
            top = max(cost_hint.values(), default=0.0)
            level = sorted(
                level, key=lambda n: -cost_hint.get(n, top + 1.0)
            )
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=parallelism) as pool:
            list(pool.map(write, level))
        # downstream levels must read the materialized artifacts
        for name in level:
            ctx._built[name] = spark.read.parquet(paths[name])
        if timings is not None:
            timings.setdefault("levels", []).append(
                {
                    "n_tables": len(level),
                    "sec": round(time.perf_counter() - t0, 3),
                }
            )
    return paths


# --------------------------------------------------------------------------
# incremental materialization
# --------------------------------------------------------------------------


def write_incremental(df: DataFrame, spark: SparkSession, path: str, watermark_col: str) -> int:
    """Append-only incremental build keyed on a monotone watermark column
    (dbt's incremental materialization; the reference declares event_time
    metadata for this but never uses it — SURVEY §2.10). First run writes
    everything; later runs append only rows past the stored high-water mark.
    Returns the number of rows written."""
    import os

    if os.path.exists(path):
        high = (
            spark.read.parquet(path).agg(F.max(watermark_col).alias("h")).first().h
        )
        fresh = df.filter(F.col(watermark_col) > F.lit(high))
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(path)
        return n
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def write_insert_overwrite(
    df: DataFrame, spark: SparkSession, path: str, partition_col: str
) -> dict:
    """dbt's ``insert_overwrite`` incremental strategy on a
    date-partitioned table: replace EXACTLY the partitions present in the
    batch, leave every other partition untouched — the idempotent
    backfill/restatement materialization (re-running a day restates that
    day; it never truncates the table the way a plain overwrite would).

    Uses Spark's dynamic partitionOverwriteMode, so the file commit only
    rewrites directories named in the batch — at 100 TB that is the month
    being restated, not the fact table. The session conf is restored
    afterwards (static mode is the safer default for ad-hoc writes).

    Returns {"partitions_written": [...], "rows_written": n}.
    """
    # the distinct partition list lands on the DRIVER: fine for the
    # date/month partitions this strategy exists for (thousands), unbounded
    # if a caller passes a high-cardinality column — fail loudly instead of
    # OOMing the driver (and a >MAX_PARTITIONS partitionBy would be a
    # small-files disaster on the write path anyway)
    parts = [
        r[0]
        for r in df.select(partition_col)
        .distinct()
        .limit(MAX_OVERWRITE_PARTITIONS + 1)
        .collect()
    ]
    if len(parts) > MAX_OVERWRITE_PARTITIONS:
        raise ValueError(
            f"insert_overwrite: partition column {partition_col!r} has more "
            f"than {MAX_OVERWRITE_PARTITIONS} distinct values — that is not "
            "a partition grain; partition on a bounded column (day/month) "
            "or raise MAX_OVERWRITE_PARTITIONS explicitly"
        )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "partitions_written": sorted(str(p) for p in parts),
        "rows_written": df.count(),
    }


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str | None = None,
) -> dict:
    """Keyed MERGE (upsert) into a parquet table without a table format:
    the update set wins on key collision; with ``version_col`` set, the
    higher version wins regardless of which side it came from (idempotent
    replay of late/duplicate batches). Returns insert/update counts.

    Mechanics: full-outer-join-free — the target's colliding keys are
    dropped via LEFT ANTI against the (broadcast-sized) update key set,
    then updates append. At 100 TB with a partitioned target the anti join
    + rewrite touch only the partitions the updates land in (here: whole
    table, the corpus is unpartitioned); for the table-format version —
    versioned snapshots, copy-on-write MERGE that rewrites only key-range-
    overlapping files, time travel — see dbt_tpch_spark.tableformat.TxnTable
    (same logical plan, file-skipping on top).

    Writes to a temp sibling, parks the old target aside, then promotes —
    a failed WRITE never touches the target, and a crash mid-swap leaves
    the previous state recoverable at ``<path>__merge_old``."""
    import os
    import shutil

    if not os.path.exists(path):
        updates.write.mode("overwrite").parquet(path)
        return {"inserted": spark.read.parquet(path).count(), "updated": 0}

    target = spark.read.parquet(path)
    if version_col is not None:
        # keep the max-version row per key across both sides
        from pyspark.sql.window import Window

        # __side breaks equal-version ties deterministically in favor of
        # the update row, so replaying a near-duplicate batch converges
        # instead of picking a nondeterministic window winner
        merged = target.withColumn("__side", F.lit(0)).unionByName(
            updates.withColumn("__side", F.lit(1))
        )
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(version_col).desc(), F.col("__side").desc()
        )
        result = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__side")
        )
    else:
        keys = updates.select(*key_cols).distinct()
        result = target.join(F.broadcast(keys), key_cols, "left_anti").unionByName(
            updates
        )

    n_target = target.count()
    n_updates = updates.count()
    tmp = f"{path}__merge_tmp"
    result.write.mode("overwrite").parquet(tmp)
    n_result = spark.read.parquet(tmp).count()
    # park-then-promote: never rmtree the only copy before the new one is
    # in place — a crash between the renames leaves `old` recoverable
    old = f"{path}__merge_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    updated = n_target + n_updates - n_result
    return {"inserted": n_updates - updated, "updated": updated}
