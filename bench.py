"""Benchmark runner: executes the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing model: per query, force full execution with a count-style action over
all columns; the model DAG is rebuilt per query (cold Catalyst plan) but the
SparkSession/JVM is shared, mirroring how the reference amortizes one
warehouse connection across its dbt DAG (reference: profiles.yml threads).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


#: headline queries — the flagship TPC-H report, the heaviest relational
#: models, and one representative of each extension-operator family.
HEADLINE = [
    "rpt_pricing_summary",
    "fct_orders",
    "fct_orders_items",
    "dim_customer",
    "int_market_basket",
    "customer_rfm_segments",
    "monthly_revenue_kpis",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "events_session_30m",
    "doc_text_stats",
    # one representative per round-1 extension family
    "events_asof_last_click",
    "doc_pack_sequences",
    "kmeans_cells",
    "docs_bm25_topk",
    "events_gapfill_hourly",
    "parts_pagerank",
    "ann_pq_adc_topk",
    "tpch_q05_local_supplier_volume",
    "events_hll_users",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from dbt_tpch_spark.plans import MODELS, Context, import_all_models
    from dbt_tpch_spark.session import get_spark

    import_all_models()
    spark = get_spark("dbt-tpch-spark-bench")

    try:
        from dbt_tpch_spark.operators import entries as op_entries

        extra = op_entries.bench_queries()
    except ImportError:
        extra = {}

    names = [n for n in HEADLINE if n in MODELS] + list(extra)

    # warm the JVM + parquet footers once with the cheapest model
    Context(spark, sf_dir).ref("ods_orders").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        start = time.perf_counter()
        if name in extra:
            df = extra[name](spark, sf_dir)
        else:
            df = Context(spark, sf_dir).ref(name)
        # force full materialization of every column (count() alone would let
        # Catalyst prune the plan down to nothing)
        df.agg(F.max(F.xxhash64(*df.columns))).collect()
        elapsed = time.perf_counter() - start
        timings[name] = round(elapsed, 3)
        total += elapsed

    # full-DAG warehouse build: the engine analogue of the reference's
    # headline number (`dbt build`, all models, threads=4 —
    # BASELINE.md row 1)
    import tempfile

    from dbt_tpch_spark.warehouse import build_warehouse

    with tempfile.TemporaryDirectory() as d:
        start = time.perf_counter()
        paths = build_warehouse(
            spark,
            sf_dir,
            d,
            parallelism=4,
            layers=("ods", "wh", "intermediate", "metrics", "reports", "extended"),
        )
        full_build = time.perf_counter() - start

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "full_dag_build_sec": round(full_build, 3),
                "full_dag_tables": len(paths),
            }
        )
    )


if __name__ == "__main__":
    main()
