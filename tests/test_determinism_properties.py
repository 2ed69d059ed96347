"""Property-based cross-engine checks (hypothesis) for the determinism
conventions in functions/ + models/oracle.py: for arbitrary doubles, the
Spark expression and the DuckDB expression must produce bit-identical
results — this is the foundation the whole parity gate stands on."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from dbt_tpch_spark.functions import dsum, money, rnd
from dbt_tpch_spark.models.oracle import dsum_sql, money_sql, rnd_sql

finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


def _spark_vals(spark, xs, col):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    return [r[0] for r in df.select(col.alias("y")).collect()]


def _duck_vals(xs, expr):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": [float(x) for x in xs]}))
    return [r[0] for r in con.execute(f"SELECT {expr} AS y FROM t").fetchall()]


@settings(max_examples=8, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=200))
def test_money_bit_identical(spark, xs):
    assert _spark_vals(spark, xs, money(F.col("x"))) == _duck_vals(
        xs, money_sql("x")
    )


@settings(max_examples=8, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=200), st.integers(0, 6))
def test_rnd_bit_identical(spark, xs, n):
    assert _spark_vals(spark, xs, rnd(F.col("x"), n)) == _duck_vals(
        xs, rnd_sql("x", n)
    )


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=500))
def test_dsum_order_independent_and_cross_engine(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    a = df.select(dsum(F.col("x")).alias("y")).collect()[0][0]
    # reversed input order must not change the exact-decimal sum
    b = (
        spark.createDataFrame([(float(x),) for x in reversed(xs)], "x double")
        .select(dsum(F.col("x")).alias("y"))
        .collect()[0][0]
    )
    assert a == b
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": [float(x) for x in xs]}))
    c = con.execute(f"SELECT {dsum_sql('x')} FROM t").fetchone()[0]
    assert a == c


@pytest.mark.parametrize("x", [0.125, -0.125, 2.675, 0.285, 1.0005, -1.0005])
def test_money_known_boundary_cases(spark, x):
    """Values near 4-dp rounding boundaries — the cases where decimal casts
    diverged between engines before the floor-formula convention."""
    s = _spark_vals(spark, [x], money(F.col("x")))[0]
    d = _duck_vals([x], money_sql("x"))[0]
    assert s == d


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=1e-9, max_value=1e9, allow_nan=False),
        min_size=1,
        max_size=200,
    )
)
def test_quantized_ln_bit_identical(spark, xs):
    """rnd(ln(x), 6) must agree across engines — the assumption under every
    ln-derived score (TF-IDF, BM25, PMI, surprisal, PageRank's teleport
    arithmetic). ln is not IEEE-correctly-rounded (unlike sqrt), so scores
    are always quantized before ranking/summing; this checks the quantized
    values actually coincide."""
    assert _spark_vals(spark, xs, rnd(F.log(F.col("x")), 6)) == _duck_vals(
        xs, rnd_sql("ln(x)", 6)
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(finite_doubles, min_size=2, max_size=300),
    st.sampled_from([0.25, 0.5, 0.9, 0.95]),
)
def test_exact_percentile_bit_identical(spark, xs, q):
    """Spark percentile() and DuckDB quantile_cont() both linearly
    interpolate at rank (n-1)*q — the assumption under events_json_props'
    p50/p95 and the funnel medians. Quantized at rnd 6 like every
    consumer."""
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    sp = df.agg(
        rnd(F.expr(f"percentile(x, {q})"), 6).alias("y")
    ).collect()[0][0]
    con = __import__("duckdb").connect()
    import pandas as pd

    con.register("t", pd.DataFrame({"x": [float(x) for x in xs]}))
    du = con.execute(
        f"SELECT {rnd_sql(f'quantile_cont(x, {q})', 6)} FROM t"
    ).fetchone()[0]
    assert sp == du
