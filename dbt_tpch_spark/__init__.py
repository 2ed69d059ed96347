"""dbt_tpch_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the DataRecce/dbt-tpch reference project.

The reference is a dbt project (70 SQL models over the TPC-H schema) executed
by an external database (reference: README.md:1-13, dbt_project.yml:26-40).
This engine replaces both halves Spark-first:

* dbt's Jinja-compile + DAG scheduling  -> a thin Python model registry
  (:mod:`dbt_tpch_spark.plans`) of pure ``Context -> DataFrame`` functions.
* the target database (DuckDB/Postgres/Snowflake) -> Spark SQL / Catalyst.

Layout
------
``sources/``   schema-checked parquet readers for the test corpus tables.
``functions/`` the macro layer (``money()``, surrogate keys, deterministic
               aggregate helpers) — reference: macros/*.sql.
``models/``    the 70-model DAG re-expressed as DataFrame transformations.
``plans/``     model registry + lazy materializer (dbt's DAG equivalent).
``operators/`` large-scale data-pipeline extensions: dedup, similarity
               search, text analysis, multimodal plumbing.
``streaming/`` event-time windowing over the ``events`` table (batch
               equivalent + Structured Streaming forms).
"""

__version__ = "0.1.0"
