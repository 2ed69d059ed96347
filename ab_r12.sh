#!/bin/bash
# Same-window A/B: interleave the optimized tree (HEAD_DIR) against the
# round-11 baseline worktree (BASE_DIR), twice each (head,base,head,base),
# over the contested queries. Host drift cancels in the interleave;
# min-of-two per side is the signal. Results land as
# PROFILE_r12_abHEAD{A,B}.json / PROFILE_r12_abBASE{A,B}.json.
# Both paths are parameterized (round-11 ADVICE): the baseline worktree is
# created with `git worktree add $BASE_DIR <baseline-commit>`.
set -u
HEAD_DIR=${HEAD_DIR:-/root/repo}
BASE_DIR=${BASE_DIR:-/root/wt_r12base}
QUERIES=${QUERIES:-"dedup_ppjoin events_gapfill_hourly parts_neighbor_similarity dedup_multibatch_txn customer_rfm_segments"}
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
[ -f "$BASE_DIR/profile_r12.py" ] || cp "$HEAD_DIR/profile_r12.py" "$BASE_DIR/profile_r12.py"
for leg in A B; do
  cd "$HEAD_DIR" && python profile_r12.py "abHEAD${leg}" $QUERIES > /tmp/ab12_head_${leg}.log 2>&1
  echo "head ${leg} done"
  cd "$BASE_DIR" && python profile_r12.py "abBASE${leg}" $QUERIES > /tmp/ab12_base_${leg}.log 2>&1
  echo "base ${leg} done"
done
echo AB-DONE
