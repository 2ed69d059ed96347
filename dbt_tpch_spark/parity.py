"""Local oracle-parity harness mirroring the driver's correctness gate:
run the Spark query and the DuckDB oracle SQL over the same parquet, compare
row count + schema shape + order-insensitive values (columns sorted by name,
rows sorted by stringified values).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from dbt_tpch_spark.sources import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v: Any) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_value)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    report: dict[str, Any] = {
        "rows_spark": len(spark_pdf),
        "rows_oracle": len(oracle_pdf),
        "cols_spark": sorted(spark_pdf.columns),
        "cols_oracle": sorted(oracle_pdf.columns),
    }
    report["rows_match"] = report["rows_spark"] == report["rows_oracle"]
    report["cols_match"] = report["cols_spark"] == report["cols_oracle"]
    if not (report["rows_match"] and report["cols_match"]):
        report["values_match"] = False
        return report

    a = canonicalize(spark_pdf)
    b = canonicalize(oracle_pdf)
    eq = a.equals(b)
    report["values_match"] = eq
    if not eq:
        mism = (a != b).any(axis=0)
        report["mismatch_columns"] = [c for c in a.columns if mism[c]]
        diffs = []
        neq_rows = (a != b).any(axis=1)
        for idx in a.index[neq_rows][:5]:
            for c in a.columns:
                if a.at[idx, c] != b.at[idx, c]:
                    diffs.append((int(idx), c, a.at[idx, c], b.at[idx, c]))
        report["examples"] = diffs[:10]
    return report


def check_query(spark, sf_dir: str, fn, sql: str) -> dict:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(sql).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
