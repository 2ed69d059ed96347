#!/bin/bash
# Hunt for a quiet window (hypervisor steal), then run the solo bench.
# EVERY run's full record is archived under bench_runs_r11/ (the full
# record carries queries_steal_pct, so even a partially-taxed run yields
# clean per-query samples). Stops early once a run lands with overall
# steal_pct below the threshold. Usage: quiet_bench.sh [max_attempts] [steal_ok]
set -u
MAX=${1:-12}
OK=${2:-3.0}
cd /root/repo
mkdir -p bench_runs_r11
for i in $(seq 1 "$MAX"); do
    st=$(python3 - <<'EOF'
import time
def snap():
    p = open('/proc/stat').readline().split()
    v = list(map(int, p[1:]))
    return sum(v), v[7]
t0, s0 = snap(); time.sleep(30); t1, s1 = snap()
print(f"{100*(s1-s0)/max(1,(t1-t0)):.2f}")
EOF
)
    echo "attempt $i: 30s steal probe = ${st}%"
    if python3 -c "import sys; sys.exit(0 if float('${st}') < 1.5 else 1)"; then
        SPARK_GRAFT_SOLO=1 python bench.py > /tmp/quiet_bench_run.log 2>&1
        rec_steal=$(python3 -c "import json; print(json.load(open('BENCH_LAST_FULL.json')).get('steal_pct', 99))")
        ts=$(date +%H%M%S)
        cp BENCH_LAST_FULL.json "bench_runs_r11/run_${ts}_steal${rec_steal}.json"
        echo "attempt $i: bench done, record steal_pct = ${rec_steal} -> bench_runs_r11/run_${ts}_steal${rec_steal}.json"
        if python3 -c "import sys; sys.exit(0 if float('${rec_steal}') < ${OK} else 1)"; then
            cp BENCH_LAST_FULL.json BENCH_r11_solo_d.json
            echo "CLEAN RECORD -> BENCH_r11_solo_d.json"
            exit 0
        fi
    fi
    sleep 240
done
echo "no clean window found in ${MAX} attempts"
exit 1
