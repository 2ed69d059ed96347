"""Empirical 10x scale probe (VERDICT r9 #1).

The repo's 100 TB posture rested on STRUCTURAL evidence: three CI plan
invariants (unpartitioned windows, ungated broadcasts, unbounded pair
stages) that walk every query plan. This probe adds MEASURED evidence:
build a deterministic 10x replica of the sf0.1 corpus, run the most
expensive queries plus the pair-stage family at 1x and 10x, and record
wall, executor CPU, and shuffle-write bytes at both scales. A query whose
wall grows superlinearly beyond the log factor (ratio > ~13x for a 10x
input) is a scale bug regardless of what the plan shape claims.

Corpus construction (deterministic, seedless):
- Every fact/entity table is unioned ``replicas`` times with per-replica
  key shifts that PRESERVE FK consistency (replica k's lineitem references
  replica k's orders/parts/suppliers), so joins behave like a corpus that
  actually grew instead of degenerating into key collisions.
- ``documents.text`` gets a per-replica suffix appended to EVERY token
  (an injective token rename). Within a replica, shingle-set Jaccard is
  EXACTLY preserved (the dup/near-dup structure replicates); across
  replicas every 3-gram shingle differs, so replicas are not near-dups of
  each other — without this, a 10x corpus would plant ~45 artificial
  cross-replica dup pairs per document and the pair stage would measure a
  fake quadratic workload, not scale-up.
- ``events`` keeps its time range (user/event ids shift): a 10x corpus
  means 10x denser traffic over the same window — the realistic growth
  mode for a telemetry table, and the one that stresses per-hour grids.
- region/nation stay single-copy (fixed dimensions at any SF).
- The 1x baseline is replica 0 alone WRITTEN THROUGH THE SAME PIPELINE
  (same token transform, same multi-file layout), so 1x vs 10x differ
  only in scale, never in format.

Usage: python scale_probe.py [--replicas 10] [--runs 2]
Writes SCALE_PROBE_LAST.json; the per-round record is copied to
SCALE_PROBE_r{N}.json and adjudicated in PLANS.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import time

from pyspark.sql import functions as F

from bench import _cpu_ticks, _loadavg, _steal_pct, _calibrate

#: queries the probe measures: the round-9 top-5 by solo wall, plus the
#: pair-stage family the verdict names, plus the full-LSH head.
PROBE_QUERIES = [
    "parts_pagerank",
    "parts_neighbor_similarity",
    "customer_rfm_segments",
    "dedup_ppjoin",
    "events_gapfill_hourly",
    "dedup_minhash_lsh",
    # extended coverage: the other pair-stage/window families with
    # scale-sensitive shapes (substring winnowing, banded sign-LSH over
    # embeddings, gap-based sessionization)
    "docs_winnow_dups",
    "dedup_embedding_cosine",
    "events_session_30m",
]

#: superlinear gate: 10x input may cost up to 10x * log-factor; beyond
#: this the query is adjudicated or fixed (VERDICT r9 #1 wording).
MAX_OK_RATIO = 13.0

_KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
_DIMS = ("region", "nation")


def _offsets(spark, src_dir: str) -> dict[str, int]:
    """Per-key-domain shift: next power of 10 above the max key, so
    replica ids never collide and stay human-readable in debugging."""
    offs: dict[str, int] = {}
    for table, cols in _KEYED.items():
        df = spark.read.parquet(f"{src_dir}/{table}.parquet")
        for col, domain in cols.items():
            mx = df.agg(F.max(col)).first()[0] or 0
            need = 10 ** math.ceil(math.log10(max(int(mx) + 1, 10)))
            offs[domain] = max(offs.get(domain, 0), need)
    return offs


def build_scaled_corpus(
    spark, src_dir: str, out_dir: str, replicas: int, n_files: int = 32
) -> None:
    """Write the deterministic ``replicas``x corpus (see module docstring)."""
    # the per-replica orthogonal map (Walsh signs on i & k + rotation by
    # 6k mod 64) cycles back to the IDENTITY at k=64 — replica 64 would be
    # an exact copy of replica 0 and plant the cross-replica dups the
    # transform exists to prevent; fail loudly instead
    if replicas > 64:
        raise ValueError(
            "build_scaled_corpus supports at most 64 replicas (the "
            "embedding decorrelation map cycles at k=64)"
        )
    offs = _offsets(spark, src_dir)
    for table, cols in _KEYED.items():
        src = spark.read.parquet(f"{src_dir}/{table}.parquet")
        parts = []
        for k in range(replicas):
            rep = src
            for col, domain in cols.items():
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(k * offs[domain])).cast("long")
                )
            if table == "documents":
                # injective per-replica token rename: within-replica
                # Jaccard exactly preserved, cross-replica ~0
                rep = rep.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1x{k}")
                ).withColumn("n_chars", F.length("text").cast("long"))
            if table == "embeddings":
                # per-replica ORTHOGONAL transform (Walsh sign flips +
                # coordinate rotation): within-replica cosines preserved
                # EXACTLY, cross-replica copies decorrelated — otherwise
                # every vector ships 9 exact duplicates and the sign-LSH
                # pair stage measures a planted quadratic workload, not
                # scale-up (same reasoning as the documents token rename).
                # k=0 is the identity, so the 1x baseline is untouched.
                dim = 64
                signs = [
                    1.0 if bin(i & k).count("1") % 2 == 0 else -1.0
                    for i in range(dim)
                ]
                rot = (6 * k) % dim
                emb = F.col("embedding")
                if rot:
                    emb = F.concat(
                        F.slice(emb, rot + 1, dim - rot), F.slice(emb, 1, rot)
                    )
                rep = rep.withColumn(
                    "embedding",
                    F.zip_with(
                        emb,
                        F.array(*[F.lit(s) for s in signs]),
                        lambda x, s: (x * s).cast("float"),
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
    for t in _DIMS:
        shutil.copyfile(f"{src_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")


def _stage_totals(spark) -> tuple[int, int]:
    """(executor CPU ns, shuffle write bytes) summed over retained stages;
    per-query deltas isolate one query's cost."""
    sc = spark.sparkContext
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    store = sc._jsc.sc().statusStore()
    empty = sc._jvm.java.util.ArrayList()
    defaults = [getattr(store, f"stageList$default${i}")() for i in range(2, 6)]
    stages = store.stageList(empty, *defaults)
    cpu = shuf = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        cpu += s.executorCpuTime()
        shuf += s.shuffleWriteBytes()
    return cpu, shuf


def _run_query(spark, sf_dir: str, name: str) -> dict:
    """Execute the full plan (noop sink: no driver collect, no output
    skew) and return wall / CPU / shuffle-write deltas plus row count."""
    from dbt_tpch_spark.plans import Context, import_all_models

    import_all_models()
    ctx = Context(spark, sf_dir)
    cpu0, shuf0 = _stage_totals(spark)
    t0 = time.perf_counter()
    df = ctx.ref(name)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    cpu1, shuf1 = _stage_totals(spark)
    return {
        "wall_sec": round(wall, 3),
        "cpu_sec": round((cpu1 - cpu0) / 1e9, 3),
        "shuffle_write_mb": round((shuf1 - shuf0) / 1e6, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--src", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--workdir", default="/tmp/spark_graft_scale_probe")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of PROBE_QUERIES (default: all)",
    )
    args = ap.parse_args()
    probe_names = args.queries.split(",") if args.queries else PROBE_QUERIES

    from dbt_tpch_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    ticks0, load0 = _cpu_ticks(), _loadavg()
    calib_sec, calib32_sec, effective_cores = _calibrate()

    dirs = {}
    build_secs = {}
    for label, reps in (("1x", 1), ("10x", args.replicas)):
        d = os.path.join(args.workdir, label)
        t0 = time.perf_counter()
        build_scaled_corpus(spark, args.src, d, reps)
        build_secs[label] = round(time.perf_counter() - t0, 3)
        dirs[label] = d

    results: dict[str, dict] = {}
    for name in probe_names:
        results[name] = {}
        for label in ("1x", "10x"):
            samples = [
                _run_query(spark, dirs[label], name) for _ in range(args.runs)
            ]
            best = min(samples, key=lambda s: s["wall_sec"])
            results[name][label] = {
                **best,
                "wall_samples": [s["wall_sec"] for s in samples],
            }
        w1 = results[name]["1x"]["wall_sec"]
        w10 = results[name]["10x"]["wall_sec"]
        ratio = round(w10 / w1, 2) if w1 > 0 else None
        results[name]["wall_ratio"] = ratio
        # measured scaling exponent: wall ~ N^e  =>  e = log(ratio)/log(10)
        results[name]["exponent"] = (
            round(math.log(ratio) / math.log(args.replicas), 3)
            if ratio and ratio > 0
            else None
        )
        results[name]["superlinear"] = bool(ratio and ratio > MAX_OK_RATIO)
        c1 = results[name]["1x"]["shuffle_write_mb"]
        c10 = results[name]["10x"]["shuffle_write_mb"]
        results[name]["shuffle_ratio"] = round(c10 / c1, 2) if c1 else None
        print(
            f"{name}: {w1:.2f}s -> {w10:.2f}s (x{ratio}), "
            f"shuffle {c1:.1f} -> {c10:.1f} MB",
            flush=True,
        )

    record = {
        "metric": "scale_probe_10x",
        "replicas": args.replicas,
        "runs_per_point": args.runs,
        "src": args.src,
        "queries": results,
        "corpus_build_sec": build_secs,
        "max_ok_ratio": MAX_OK_RATIO,
        "superlinear": sorted(
            n for n, r in results.items() if r.get("superlinear")
        ),
        "loadavg_before": load0,
        "loadavg_after": _loadavg(),
        "steal_pct": _steal_pct(ticks0, _cpu_ticks()),
        "calib_sec": calib_sec,
        "calib32_sec": calib32_sec,
        "effective_cores": effective_cores,
        "solo": os.environ.get("SPARK_GRAFT_SOLO", "0") == "1",
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "SCALE_PROBE_LAST.json"), "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({k: record[k] for k in ("metric", "superlinear", "steal_pct", "effective_cores")}))
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
