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
