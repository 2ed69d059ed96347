"""Oracle-SQL registry: for every model, ANSI SQL that DuckDB can run over
the raw parquet views to produce the *identical* result (names, types,
values) as the Spark model. The driver uses these for the correctness gate.

Each entry is a SQL body whose FROM clauses reference either raw source
tables (pre-registered DuckDB views: region nation customer supplier part
orders lineitem events documents embeddings) or other model names; the
resolver expands model references into a transitive WITH-CTE prelude, exactly
how dbt inlines ephemeral models (reference: dbt_project.yml:29-30).

The ``*_sql`` helpers mirror :mod:`dbt_tpch_spark.functions` so both engines
run the same arithmetic (see determinism notes there).
"""

from __future__ import annotations

SOURCE_TABLES = {
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
}

#: name -> (deps, sql_body)
ORACLE: dict[str, tuple[tuple[str, ...], str]] = {}


def oracle(name: str, deps: tuple[str, ...], sql: str) -> None:
    if name in SOURCE_TABLES:
        raise ValueError(
            f"model name {name!r} collides with a raw source table; rename it"
        )
    ORACLE[name] = (tuple(deps), sql)


def money_sql(expr: str) -> str:
    # keep in lockstep with functions.money(): floor(x*1e4 + 0.5)/1e4
    return f"(FLOOR(({expr}) * 10000.0 + 0.5) / 10000.0)"


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / COUNT({expr}))"


def wsum_sql(expr: str, over: str) -> str:
    """Windowed decimal-exact sum cast to double (twin of functions.dsum_over)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) OVER ({over}) AS DOUBLE)"


def rnd_sql(expr: str, n: int) -> str:
    # keep in lockstep with functions.rnd(): floor(x*10^n + 0.5)/10^n
    scale = float(10**n)
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"


def isum_sql(expr: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT)"


def dvar_samp_sql(expr: str) -> str:
    # keep in lockstep with functions.dvar_samp()
    sx = f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST((({expr}) * ({expr})) AS DECIMAL(27,6))) AS DOUBLE)"
    n = f"COUNT({expr})"
    return f"CASE WHEN {n} > 1 THEN ({sxx} - {sx} * {sx} / {n}) / ({n} - 1) END"


def dstddev_samp_sql(expr: str) -> str:
    return f"sqrt({dvar_samp_sql(expr)})"


def days_between_sql(end: str, start: str) -> str:
    return f"CAST(DATEDIFF('day', {start}, {end}) AS BIGINT)"


def month_sql(expr: str) -> str:
    return f"DATE_TRUNC('month', {expr})"


def surrogate_key_sql(*exprs: str) -> str:
    parts = ", ".join(
        f"COALESCE(CAST({e} AS VARCHAR), '_dbt_utils_surrogate_key_null_')"
        for e in exprs
    )
    return f"MD5(CONCAT_WS('-', {parts}))"


def _resolve_deps(name: str, seen: dict[str, None]) -> None:
    if name in seen or name in SOURCE_TABLES:
        return
    deps, _ = ORACLE[name]
    for d in deps:
        _resolve_deps(d, seen)
    seen[name] = None


def render(name: str) -> str:
    """Expand a model's oracle body with a transitive CTE prelude."""
    order: dict[str, None] = {}
    deps, body = ORACLE[name]
    for d in deps:
        _resolve_deps(d, order)
    if not order:
        return body
    ctes = ",\n".join(f"{n} AS (\n{ORACLE[n][1]}\n)" for n in order)
    stripped = body.lstrip()
    if stripped.upper().startswith("WITH RECURSIVE "):
        # RECURSIVE applies to the merged clause as a whole
        return f"WITH RECURSIVE {ctes},\n{stripped[len('WITH RECURSIVE '):]}"
    if stripped.upper().startswith("WITH "):
        # merge the body's own CTE list into the prelude
        return f"WITH {ctes},\n{stripped[5:]}"
    return f"WITH {ctes}\n{body}"


def all_rendered() -> dict[str, str]:
    return {name: render(name) for name in ORACLE}
