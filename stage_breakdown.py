"""Per-stage breakdown of ONE query's execution: wall, executor CPU,
shuffle bytes, task count, and the stage's callsite name — the attribution
tool for deciding WHERE a query's CPU goes (guide §1/§7).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python stage_breakdown.py <query>
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _presplit_corpus
    from dbt_tpch_spark.plans import Context, import_all_models
    from dbt_tpch_spark.session import get_spark

    import_all_models()
    spark = get_spark("stage-breakdown")
    import tempfile

    with tempfile.TemporaryDirectory() as split_dir:
        _presplit_corpus(
            spark, sf_dir, split_dir,
            n_files=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        )
        Context(spark, split_dir).ref("ods_orders").count()
        sc = spark.sparkContext
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        store = sc._jsc.sc().statusStore()

        def stage_ids():
            empty = sc._jvm.java.util.ArrayList()
            defaults = [
                getattr(store, f"stageList$default${i}")() for i in range(2, 6)
            ]
            stages = store.stageList(empty, *defaults)
            return {
                stages.apply(i).stageId(): stages.apply(i)
                for i in range(stages.size())
            }

        seen = set(stage_ids())
        t0 = time.perf_counter()
        df = Context(spark, split_dir).ref(name)
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.agg(F.max(F.xxhash64(*df.columns))).collect()
        action = time.perf_counter() - t0
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        rows = []
        for sid, st in stage_ids().items():
            if sid in seen:
                continue
            sub = st.submissionTime()
            done = st.completionTime()
            wall = None
            try:
                if sub.isDefined() and done.isDefined():
                    wall = (done.get().getTime() - sub.get().getTime()) / 1e3
            except Exception:
                pass
            rows.append(
                (
                    sid,
                    wall or 0.0,
                    st.executorCpuTime() / 1e9,
                    st.executorRunTime() / 1e3,
                    st.shuffleWriteBytes(),
                    st.shuffleReadBytes(),
                    st.numCompleteTasks(),
                    str(st.name())[:100],
                )
            )
        print(f"\n== {name}: build {build:.2f}s action {action:.2f}s ==")
        print(
            f"{'sid':>5} {'wall':>6} {'cpu':>7} {'run':>7} {'shW_MB':>7} "
            f"{'shR_MB':>7} {'tasks':>5}  name"
        )
        for r in sorted(rows, key=lambda r: -r[2]):
            print(
                f"{r[0]:>5} {r[1]:6.2f} {r[2]:7.2f} {r[3]:7.2f} "
                f"{r[4] / 1e6:7.1f} {r[5] / 1e6:7.1f} {r[6]:>5}  {r[7]}"
            )
        print(
            f"TOTAL cpu {sum(r[2] for r in rows):.1f}s "
            f"run {sum(r[3] for r in rows):.1f}s over {len(rows)} stages"
        )


if __name__ == "__main__":
    main()
