"""Property-based checks for the scale-safe global ordering helpers
(functions.global_topk / functions.global_row_number): for arbitrary data —
duplicates, skew, tiny and empty-ish frames — they must produce exactly the
result of the single-partition window they replace. The helpers are the
round-3 answer to the unpartitioned-window scale-killers; these tests pin
their semantics independently of any one query."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from dbt_tpch_spark.functions import global_row_number, global_topk


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=300,
        unique=True,
    ),
    st.integers(min_value=1, max_value=40),
)
def test_global_topk_matches_sorted_head(spark, ids, k):
    rows = [(i, hashlib.md5(f"t|{i}".encode()).hexdigest()) for i in ids]
    df = spark.createDataFrame(rows, "payload long, sk string")
    got = {
        (r["rn"], r["payload"])
        for r in global_topk(df, "sk", k, ["payload"]).collect()
    }
    expected = {
        (rank + 1, payload)
        for rank, (payload, _sk) in enumerate(
            sorted(((p, s) for p, s in rows), key=lambda t: t[1])[:k]
        )
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # heavy-tie numeric key
            st.integers(min_value=0, max_value=100_000),
        ),
        min_size=1,
        max_size=300,
        unique_by=lambda t: t[1],
    ),
    st.booleans(),
)
def test_global_row_number_matches_window(spark, rows, ascending):
    data = [(float(k), i) for k, i in rows]
    df = spark.createDataFrame(data, "key double, id long")
    got = {
        (r["id"], r["rn"])
        for r in global_row_number(
            df, "key", ascending, ["id"], out="rn"
        ).collect()
    }
    ordered = sorted(data, key=lambda t: (t[0] if ascending else -t[0], t[1]))
    expected = {(i, pos + 1) for pos, (_k, i) in enumerate(ordered)}
    assert got == expected


def test_global_row_number_constant_key(spark):
    """All-equal keys: one bucket, ties resolved entirely by tiebreak."""
    df = spark.range(50).select(F.lit(1.0).alias("key"), F.col("id"))
    got = sorted(
        (r["id"], r["rn"])
        for r in global_row_number(df, "key", True, ["id"]).collect()
    )
    assert got == [(i, i + 1) for i in range(50)]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # heavy-tie numeric key
            st.integers(min_value=0, max_value=100_000),
            st.integers(min_value=-1000, max_value=1000),  # measure
        ),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[1],
    ),
    st.booleans(),
)
def test_bucketed_windows_matches_window_stack(spark, rows, ascending):
    """bucketed_windows == the single-partition rank/running-sum/grand-
    total/count window stack it replaces, for arbitrary ties and skew."""
    from dbt_tpch_spark.functions import bucketed_windows

    data = [(float(k), i, float(v)) for k, i, v in rows]
    df = spark.createDataFrame(data, "key double, id long, val double")
    got = {
        (r["id"], r["rk"], r["run"], r["tot"], r["cnt"])
        for r in bucketed_windows(
            df,
            "key",
            ["id"],
            ascending=ascending,
            rank_out="rk",
            running_sum=("val", "run"),
            grand_sum=("val", "tot"),
            count_out="cnt",
        ).collect()
    }
    ordered = sorted(data, key=lambda t: (t[0] if ascending else -t[0], t[1]))
    tot = float(sum(v for _, _, v in ordered))
    run = 0.0
    expected = set()
    for pos, (_k, i, v) in enumerate(ordered):
        run += v
        expected.add((i, pos + 1, run, tot, len(ordered)))
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=0, max_value=100_000),
        ),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=1, max_value=7),
)
def test_global_ntile_matches_ntile_window(spark, rows, n):
    from pyspark.sql.window import Window

    from dbt_tpch_spark.functions import global_ntile

    data = [(float(k), i) for k, i in rows]
    df = spark.createDataFrame(data, "key double, id long")
    got = {
        (r["id"], r["t"])
        for r in global_ntile(df, n, "key", ["id"], "t").collect()
    }
    w = Window.orderBy(F.col("key"), F.col("id"))
    expected = {
        (r["id"], r["t"])
        for r in df.withColumn(
            "t", F.ntile(n).over(w).cast("long")
        ).collect()
    }
    assert got == expected


def test_global_ntile_tiny_frame_total_under_n(spark):
    """tot < n: every row gets its own tile (rank == tile) and the
    guarded .otherwise divisor never divides by zero (VERDICT r11 #9)."""
    from pyspark.sql.window import Window

    from dbt_tpch_spark.functions import global_ntile, global_ntiles

    df = spark.createDataFrame(
        [(3.0, 1), (1.0, 2), (2.0, 3)], "key double, id long"
    )
    got = {
        (r["id"], r["t"])
        for r in global_ntile(df, 5, "key", ["id"], "t").collect()
    }
    w = Window.orderBy(F.col("key"), F.col("id"))
    expected = {
        (r["id"], r["t"])
        for r in df.withColumn("t", F.ntile(5).over(w).cast("long")).collect()
    }
    assert got == expected

    got2 = {
        (r["id"], r["t"])
        for r in global_ntiles(df, 5, [("key", ["id"], "t", True)]).collect()
    }
    assert got2 == expected
