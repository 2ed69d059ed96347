"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1, reference:
models/wh/rpt_pricing_summary.sql) at sf0.001. ``queries()`` exposes every
implemented model/operator; ``oracle_sql()`` the DuckDB-equivalent SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_tpch_spark.plans import MODELS, Context, import_all_models
from dbt_tpch_spark.models import oracle as _oracle

import_all_models()

#: model layers exposed as driver queries (base is ephemeral feedstock).
_QUERY_LAYERS = {
    "ods",
    "wh",
    "intermediate",
    "metrics",
    "reports",
    "extended",
    "operators",
    "streaming",
}

#: queries with no SQL-expressible oracle (driver records rows-only checks).
NO_ORACLE: tuple[str, ...] = ()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ctx = Context(spark, "/root/testdata/sf0.001")
    return ctx.ref("rpt_pricing_summary")


def _model_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return Context(spark, sf_dir).ref(name)

    run.__name__ = f"query_{name}"
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        name: _model_query(name)
        for name, spec in MODELS.items()
        if spec.layer in _QUERY_LAYERS
    }


def oracle_sql() -> dict[str, str]:
    rendered = _oracle.all_rendered()
    return {name: rendered[name] for name in queries() if name in rendered}
