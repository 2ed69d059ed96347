"""The macro layer: reference Jinja macros re-expressed as Column helpers.

Reference parity:
* ``money()``        <- macros/dt_convert_money.sql:1-3 (``::decimal(16,4)``)
* ``surrogate_key()``<- dbt_utils.generate_surrogate_key (dbt_utils 1.3.3,
                        pinned at package-lock.yml:1-5), call sites
                        models/ods/orders_items.sql:19,
                        models/ods/parts_suppliers.sql:23
* ``housekeeping()`` <- macros/dbt_housekeeping.sql:1-4
* ``days_between``   <- date - date integer-days semantics used at
                        models/intermediate/int_shipping_delays.sql:27-29 etc.

Determinism conventions (why every helper here has a twin in
:mod:`dbt_tpch_spark.models.oracle` that emits the same SQL for DuckDB):

The driver hash-compares Spark results against a DuckDB oracle. Floating
point SUM/AVG are accumulation-order-dependent, so any ``sum(double)`` would
be nondeterministic across engines. Instead every aggregate over a money/
measure column is computed as an **exact DECIMAL sum** (order-independent)
and cast to DOUBLE at the final projection; averages divide the exact sum by
the non-null count in IEEE double arithmetic, which is bit-identical across
engines for identical operands. Money values themselves are rounded once to
4 decimals (the reference's ``::decimal(16,4)``) and carried as DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: decimal type wide enough for SF-100TB money sums (21 integer digits).
_ACC_DECIMAL = "decimal(27,6)"

SURROGATE_KEY_NULL = "_dbt_utils_surrogate_key_null_"


def money(col: Column) -> Column:
    """Reference ``money()`` macro: round to 4 decimals (decimal(16,4)).

    Implemented as ``floor(x*10000 + 0.5)/10000`` in IEEE double on BOTH
    engines: Spark's decimal cast (exact BigDecimal expansion, HALF_UP) and
    DuckDB's (scaled multiply) disagree near rounding boundaries, while this
    explicit formula is bit-identical everywhere. Result stays DOUBLE.
    """
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def dsum(col: Column) -> Column:
    """Order-independent SUM of a double measure: exact decimal accumulate,
    final cast to double."""
    return F.sum(col.cast(_ACC_DECIMAL)).cast("double")


def davg(col: Column) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count, divided in
    IEEE double arithmetic."""
    return dsum(col) / F.count(col)


def dsum_over(col: Column, window) -> Column:
    """Order-independent windowed SUM of a double measure (exact decimal
    accumulate inside the frame, final cast to double). Required because FP
    accumulation inside window frames is engine-internal-order-dependent."""
    return F.sum(col.cast(_ACC_DECIMAL)).over(window).cast("double")


def isum(col: Column) -> Column:
    """SUM of an integral column as BIGINT (matches DuckDB's cast-to-bigint)."""
    return F.sum(col).cast("long")


def dvar_samp(col: Column) -> Column:
    """Order-independent sample variance from exact decimal sums:
    (sum(x^2) - sum(x)^2/n) / (n-1). Native stddev/variance aggregate in
    either engine accumulates doubles in engine order — nondeterministic
    across engines — so the moments are decimal-exact and the final
    arithmetic is identical IEEE double ops."""
    n = F.count(col)
    sx = F.sum(col.cast(_ACC_DECIMAL)).cast("double")
    sxx = F.sum((col * col).cast(_ACC_DECIMAL)).cast("double")
    return F.when(n > 1, (sxx - sx * sx / n) / (n - F.lit(1)))


def dstddev_samp(col: Column) -> Column:
    """Order-independent sample standard deviation (see dvar_samp)."""
    return F.sqrt(dvar_samp(col))


def days_between(end: Column, start: Column) -> Column:
    """date - date -> integer days (DuckDB/Postgres semantics), as BIGINT."""
    return F.datediff(end, start).cast("long")


def safe_div(num: Column, den: Column) -> Column:
    """num / nullif(den, 0) — the pervasive division guard."""
    return num / F.nullif(den, F.lit(0))


def rnd(col: Column, n: int) -> Column:
    """round(x, n) on doubles as ``floor(x*10^n + 0.5)/10^n``.

    Same rationale as :func:`money`: Spark's ROUND (BigDecimal HALF_UP on the
    exact binary expansion) and DuckDB's (scaled multiply) disagree near
    boundaries; this explicit IEEE formula is bit-identical on both engines.
    """
    scale = F.lit(float(10**n))
    return F.floor(col * scale + F.lit(0.5)) / scale


def month_of(col: Column) -> Column:
    """date_trunc('month', d) — TIMESTAMP on both engines."""
    return F.date_trunc("month", col)


def surrogate_key(*cols: Column) -> Column:
    """dbt_utils.generate_surrogate_key semantics: md5 of '-'-joined,
    null-sentinel-coalesced, stringified parts."""
    parts = [
        F.coalesce(c.cast("string"), F.lit(SURROGATE_KEY_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def housekeeping(batch_id: str, batch_ts: str):
    """Reference dbt_housekeeping() batch-audit columns as fixed literals.

    dbt stamps invocation_id/run_started_at; the engine injects them from
    config so oracle parity holds (both sides see the same constants).
    Returns a list of Columns to splat into a select.
    """
    return [
        F.lit(batch_id).alias("dbt_batch_id"),
        F.lit(batch_ts).cast("timestamp").alias("dbt_batch_ts"),
    ]


def global_topk(df, key: str, k: int, payload_cols):
    """The 100 TB-safe rewrite of a whole-table top-k
    (``row_number().over(Window.orderBy(key)) <= k``): an unpartitioned
    window single-partitions the entire input, while the answer only needs
    k rows. Because the keys here are salted md5 hex (uniform, and
    fixed-length lowercase hex sorts lexicographically exactly as its
    numeric value), the key's own first hex digit is a free 16-way
    partitioner: rank within each digit-group in parallel (plans as
    WindowGroupLimit — a running top-k, no full sort), keep k per group,
    then one tiny ``sort_array(collect_list(...))`` over the <=16k
    candidates picks the global top k.

    Returns one row per winner with ``rn`` (1-based global rank by ``key``)
    plus ``payload_cols``. Requires ``key`` values to be unique (md5 of a
    unique id) — ties would fall through to struct comparison.
    """
    from pyspark.sql.window import Window

    w_g = Window.partitionBy("_g").orderBy(key)
    cand = (
        df.withColumn("_g", F.substring(F.col(key), 1, 1))
        .withColumn("_rn", F.row_number().over(w_g))
        .filter(F.col("_rn") <= k)
    )
    s = F.struct(F.col(key), *[F.col(c) for c in payload_cols])
    return (
        cand.groupBy()
        .agg(F.slice(F.sort_array(F.collect_list(s)), 1, k).alias("_top"))
        .select(F.posexplode("_top").alias("_pos", "_s"))
        .select(
            (F.col("_pos") + 1).alias("rn"),
            *[F.col(f"_s.{c}").alias(c) for c in payload_cols],
        )
    )


def global_row_number(
    df,
    first_key: str,
    ascending: bool,
    tiebreak_cols,
    out: str = "rn",
    n_buckets: int = 32,
):
    """Exact global ``row_number() over (order by first_key [desc], *ties)``
    without a single-partition window (which moves the whole input to one
    task). Approx-quantile edges on ``first_key`` — a tiny sketch collected
    once and inlined as literals — range-bucket the rows; a bucket is a
    pure function of ``first_key``, so tied keys never straddle buckets and
    the tie-break columns resolve within one partition. Per-bucket ranks
    run in parallel (plain partitioned window); bucket-count offsets (a
    <=n_buckets-row post-aggregation frame, the only unpartitioned window)
    lift them to exact global positions. The approximate edges only choose
    where the parallelism cuts fall — the ranks are exact.

    ``first_key`` must be numeric (percentile sketch). Returns ``df`` plus
    the ``out`` rank column.
    """
    from pyspark.sql.window import Window

    probs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = df.agg(
        F.percentile_approx(first_key, probs, 10000).alias("e")
    ).head()
    edges = sorted(set(edges_row["e"] or []), reverse=not ascending)
    chain = None
    for i, ed in enumerate(edges):
        cond = (
            F.col(first_key) < F.lit(float(ed))
            if ascending
            else F.col(first_key) > F.lit(float(ed))
        )
        chain = F.when(cond, i) if chain is None else chain.when(cond, i)
    bucket = (
        chain.otherwise(len(edges)) if chain is not None else F.lit(0)
    ).cast("int")
    base = df.withColumn("_b", bucket)
    counts = base.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_b", "_off")
    order = [
        F.col(first_key).asc() if ascending else F.col(first_key).desc()
    ] + [F.col(c) for c in tiebreak_cols]
    w_local = Window.partitionBy("_b").orderBy(*order)
    return (
        base.join(F.broadcast(offsets), "_b")
        .withColumn(
            out, (F.col("_off") + F.row_number().over(w_local)).cast("long")
        )
        .drop("_b", "_off")
    )


def with_global_aggs(df, aggs):
    """The 100 TB-safe rewrite of a whole-table window
    (``F.sum(x).over(Window.partitionBy())``): compute the scalar
    aggregates ONCE, then broadcast the 1-row result back with a cross
    join. A whole-table WindowExec moves every row to a single partition;
    this plans as partial+final agg (tree reduction) plus a 1-row
    broadcast — no data movement beyond the aggregate itself.

    ``aggs``: mapping of output column name -> aggregate Column.
    """
    totals = df.agg(*[c.alias(n) for n, c in aggs.items()])
    return df.crossJoin(F.broadcast(totals))
