#!/bin/bash
# Sequential full-protocol cross-run queue (VERDICT round-2 #6): the
# remaining external datasets at reference protocol length, both
# frameworks on identical synthetic-raw artifacts. One at a time so the
# chess protocol legs keep their cores. Logs per run.
cd "$(dirname "$0")/.."
mkdir -p results/logs
export OMP_NUM_THREADS=1 MKL_NUM_THREADS=1
run() {
  name=$1; shift
  echo "$(date -u +%FT%TZ) start $name" >> results/logs/cross_queue.log
  timeout 14400 nice -n 10 python tools/cross_run_reference.py "$@" \
    > "results/logs/cross_$name.log" 2>&1
  echo "$(date -u +%FT%TZ) done $name rc=$?" >> results/logs/cross_queue.log
}
run bitcoin_otc bitcoin_otc --epochs 10000
run reddit reddit --epochs 10000
run amlsim amlsim --epochs 10000
run reddit_lp reddit_lp --epochs 1000
run bitcoin_alpha bitcoin_alpha --epochs 10000
echo "$(date -u +%FT%TZ) queue complete" >> results/logs/cross_queue.log
