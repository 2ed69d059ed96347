#!/bin/bash
# Same-window A/B: interleave the optimized tree (HEAD, /root/repo) against
# the pre-optimization baseline (05a4438, /root/wt_base) on the SAME host
# window, twice each (head,base,head,base), over the contested queries.
# Host drift cancels in the interleave; min-of-two per side is the signal.
# Results land as PROFILE_r11_abHEAD{A,B}.json / PROFILE_r11_abBASE{A,B}.json
# (head runs write into /root/repo, base runs into /root/wt_base).
set -u
QUERIES="dedup_ppjoin parts_neighbor_similarity dedup_minhash_lsh events_gapfill_hourly int_market_basket kmeans_cells parts_pagerank customer_rfm_segments dedup_multibatch_txn ann_pq_adc_topk"
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
for leg in A B; do
  cd /root/repo   && python profile_r11.py "abHEAD${leg}" $QUERIES > /tmp/ab_head_${leg}.log 2>&1
  echo "head ${leg} done"
  cd /root/wt_base && python profile_r11.py "abBASE${leg}" $QUERIES > /tmp/ab_base_${leg}.log 2>&1
  echo "base ${leg} done"
done
echo AB-DONE
