"""Round-11 optimization profiler: per-query plan capture + isolated timing.

Measures each headline query on the presplit corpus (same layout bench.py
times against): wall for the bench action (xxhash64 agg collect — the
bench's methodology) AND the noop sink (guide §1.4), executor-CPU deltas
from the app status store, and `.explain("formatted")` written to
plans/r12/<query>_<tag>.txt.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python profile_r12.py before [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def _cpu_total_ns(spark):
    try:
        sc = spark.sparkContext
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        store = sc._jsc.sc().statusStore()
        empty = sc._jvm.java.util.ArrayList()
        defaults = [getattr(store, f"stageList$default${i}")() for i in range(2, 6)]
        stages = store.stageList(empty, *defaults)
        return sum(stages.apply(i).executorCpuTime() for i in range(stages.size()))
    except Exception:
        return None


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE, _presplit_corpus
    from dbt_tpch_spark.plans import MODELS, Context, import_all_models
    from dbt_tpch_spark.session import get_spark

    import_all_models()
    spark = get_spark("dbt-tpch-spark-profile")

    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    plan_dir = os.path.join(here, "plans", "r12")
    os.makedirs(plan_dir, exist_ok=True)
    results: dict[str, dict] = {}
    names = [n for n in HEADLINE if n in MODELS]
    if only:
        names = [n for n in names if n in only]
    with tempfile.TemporaryDirectory() as split_dir:
        _presplit_corpus(
            spark, sf_dir, split_dir,
            n_files=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        )
        Context(spark, split_dir).ref("ods_orders").count()  # warm JVM

        for name in names:
            spark.sparkContext.setJobDescription(f"{tag}:{name}:build")
            t0 = time.perf_counter()
            df = Context(spark, split_dir).ref(name)
            build_sec = time.perf_counter() - t0  # eager checkpoints run here
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
            cpu0 = _cpu_total_ns(spark)
            spark.sparkContext.setJobDescription(f"{tag}:{name}:benchaction")
            t0 = time.perf_counter()
            df.agg(F.max(F.xxhash64(*df.columns))).collect()
            bench_sec = time.perf_counter() - t0
            cpu1 = _cpu_total_ns(spark)
            # noop over a FRESH DAG (checkpoints from the first build reused;
            # rebuild to charge them again like the bench does)
            spark.sparkContext.setJobDescription(f"{tag}:{name}:rebuild+noop")
            t0 = time.perf_counter()
            df2 = Context(spark, split_dir).ref(name)
            df2.write.format("noop").mode("overwrite").save()
            noop_sec = time.perf_counter() - t0
            cpu2 = _cpu_total_ns(spark)
            spark.sparkContext.setJobDescription(None)
            results[name] = {
                "build_sec": round(build_sec, 3),
                "bench_action_sec": round(bench_sec, 3),
                "bench_total_sec": round(build_sec + bench_sec, 3),
                "noop_total_sec": round(noop_sec, 3),
                "cpu_bench_sec": round((cpu1 - cpu0) / 1e9, 2)
                if cpu0 is not None and cpu1 is not None
                else None,
                "cpu_noop_sec": round((cpu2 - cpu1) / 1e9, 2)
                if cpu1 is not None and cpu2 is not None
                else None,
                "n_exchange": plan.count("Exchange"),
                "n_python": plan.count("EvalPython") + plan.count("MapInArrow")
                + plan.count("MapInPandas"),
            }
            print(
                f"{name:45s} build {build_sec:6.2f} + action {bench_sec:6.2f} "
                f"= {build_sec + bench_sec:6.2f}s  noop {noop_sec:6.2f}s  "
                f"cpu {results[name]['cpu_bench_sec']}s  "
                f"exch {results[name]['n_exchange']}",
                flush=True,
            )

    out = os.path.join(here, f"PROFILE_r12_{tag}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
