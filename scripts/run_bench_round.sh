#!/bin/bash
# Round-11 bench sequence: N idle runs, per-run detail kept, then the
# cross-run min merge (bench.py --merge) into BENCH_local_r{NN}.json.
set -e
cd /root/repo
N=${1:-3}
ROUND=${2:-11}
for i in $(seq 1 "$N"); do
  echo "=== bench run $i/$N ===" >&2
  python bench.py --detail-out "BENCH_r${ROUND}_run${i}.json" \
    > "/tmp/bench_r${ROUND}_run${i}.log" 2> "/tmp/bench_r${ROUND}_run${i}.err"
  tail -1 "/tmp/bench_r${ROUND}_run${i}.log"
done
python bench.py --merge BENCH_r${ROUND}_run*.json --out "BENCH_local_r${ROUND}.json"
