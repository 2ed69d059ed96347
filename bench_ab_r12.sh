#!/bin/bash
# Round-12 IN-SUITE A/B (VERDICT r11 #7): full bench.py runs, interleaved
# across three trees/configs — the round-11 baseline worktree (BASE_DIR),
# the round-12 head snapshot with PPJOIN_VARIANT=a (round-11 ppjoin:
# both checkpoints), and the same head with PPJOIN_VARIANT=c (scored
# checkpoint only — the cands barrier dropped). Two legs each; every
# run's full record (incl. queries_steal_pct) is archived under
# $OUT_DIR. Paths parameterized per round-11 ADVICE.
set -u
BASE_DIR=${BASE_DIR:-/root/wt_r12base}
HEAD_DIR=${HEAD_DIR:-/root/wt_r12head}
OUT_DIR=${OUT_DIR:-/root/repo/bench_runs_r12}
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
mkdir -p "$OUT_DIR"
run() { # run <dir> <tag> [env k=v]
  local dir=$1 tag=$2; shift 2
  ( cd "$dir" && env "$@" SPARK_GRAFT_SOLO=1 \
      SPARK_GRAFT_BENCH_FULL="$OUT_DIR/${tag}.json" \
      python bench.py > "$OUT_DIR/${tag}.stdout" 2> "$OUT_DIR/${tag}.stderr" )
  echo "done ${tag} steal=$(python3 -c "import json;print(json.load(open('$OUT_DIR/${tag}.json')).get('steal_pct'))" 2>/dev/null)"
}
for leg in 1 2; do
  run "$BASE_DIR" "base_${leg}"
  run "$HEAD_DIR" "head_a_${leg}" PPJOIN_VARIANT=a
  run "$HEAD_DIR" "head_c_${leg}" PPJOIN_VARIANT=c
done
echo BENCH-AB-DONE
