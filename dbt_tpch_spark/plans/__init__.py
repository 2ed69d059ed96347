"""Model registry + lazy materializer — the engine's equivalent of dbt's
Jinja-compile + DAG scheduler (reference: dbt_project.yml:26-40, layer
materializations; README.md:9-13, layer DAG).

A *model* is a pure function ``Context -> DataFrame`` registered with a name,
layer, and materialization. ``ref()``/``source()`` mirror dbt's functions
(reference call shape: models/ods/orders_items.sql:8,13):

* ``ephemeral``  (all of base/)          -> plain function composition;
  Catalyst inlines the subplan exactly like dbt inlines base models as CTEs
  (dbt_project.yml:29-30).
* ``view``       (intermediate/)         -> lazy, memoized DataFrame.
* ``table``      (ods/wh/metrics/reports)-> a real optimization boundary in
  the reference (CREATE TABLE AS, dbt_project.yml:31-40). The engine makes
  this a *policy*: ``lazy`` keeps composing (best for single-query runs —
  Catalyst prunes columns across the whole DAG), ``cache`` persists the
  DataFrame (best when many downstream models fan out from one fact, e.g.
  fct_orders_items feeding 24 report models), ``parquet`` writes and re-reads
  (the faithful CTAS, what a 100 TB deployment would do per layer).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_tpch_spark.sources import read_table

#: engine config vars (reference: dbt_project.yml:42-43 + housekeeping
#: constants injected at compile time by dbt, fixed here for oracle parity).
DEFAULT_VARS = {
    "max_ship_date": "1998-12-01",
    "batch_id": "spark-graft-batch-0",
    "batch_ts": "2026-01-01 00:00:00",
}


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    layer: str
    materialization: str  # ephemeral | view | table
    fn: Callable[["Context"], DataFrame]


MODELS: dict[str, ModelSpec] = {}


def model(name: str, layer: str, materialization: str = "view"):
    def decorator(fn: Callable[["Context"], DataFrame]):
        MODELS[name] = ModelSpec(name, layer, materialization, fn)
        return fn

    return decorator


class Context:
    """Resolution context handed to every model function."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        variables: dict | None = None,
        table_policy: str = "lazy",  # lazy | cache | parquet
        warehouse_dir: str | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.vars = {**DEFAULT_VARS, **(variables or {})}
        self.table_policy = table_policy
        self.warehouse_dir = warehouse_dir
        self._built: dict[str, DataFrame] = {}
        # build_warehouse materializes level-mates from worker threads; the
        # lock keeps ref() memoization single-writer (DataFrames themselves
        # are immutable, so races would only waste plan construction)
        import threading

        self._lock = threading.RLock()

    def source(self, name: str) -> DataFrame:
        return read_table(self.spark, self.sf_dir, name)

    def var(self, key: str):
        return self.vars[key]

    def ref(self, name: str) -> DataFrame:
        with self._lock:
            if name not in self._built:
                spec = MODELS[name]
                df = spec.fn(self)
                if spec.materialization == "table":
                    df = self._apply_table_policy(name, df)
                self._built[name] = df
            return self._built[name]

    def _apply_table_policy(self, name: str, df: DataFrame) -> DataFrame:
        if self.table_policy == "cache":
            return df.cache()
        if self.table_policy == "parquet":
            if not self.warehouse_dir:
                raise ValueError("table_policy='parquet' requires warehouse_dir")
            path = f"{self.warehouse_dir}/{name}"
            df.write.mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)
        return df

    def invalidate(self) -> None:
        self._built.clear()

    def sql(self, query: str) -> DataFrame:
        """Run ad-hoc Spark SQL against the model catalog — the interface a
        user of the reference actually has (their warehouse speaks SQL over
        dbt-materialized tables). Every registered model name or raw source
        table mentioned in the query is exposed as a temp view on demand
        (models stay lazy: registering a view just names the unexecuted
        plan, so Catalyst still prunes/pushes through model boundaries
        exactly as with ``ref()`` composition).

        Name resolution is registry-driven: identifiers in the query text
        that match a model or source name get views; everything else is
        left to Spark's analyzer."""
        import re

        from dbt_tpch_spark.sources import TABLES

        mentioned = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", query))
        with self._lock:
            for name in sorted(mentioned & set(MODELS)):
                self.ref(name).createOrReplaceTempView(name)
            for name in sorted(mentioned & set(TABLES)):
                self.source(name).createOrReplaceTempView(name)
        return self.spark.sql(query)

    def audit(self, name: str) -> dict:
        """Physical-plan audit of a model: shuffle count, scan columns and
        pushed filters, broadcasts, unpartitioned-window offenders — the
        scale-review facts as data (see plans/audit.py)."""
        from dbt_tpch_spark.plans.audit import audit_plan

        return audit_plan(self.ref(name))


def import_all_models() -> None:
    """Import every model module so the registry is populated."""
    from dbt_tpch_spark import models  # noqa: F401

    models.load_all()
