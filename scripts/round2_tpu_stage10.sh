#!/bin/bash
# Round-2 TPU stage 10: complete the fused-edge train-step A/B table at
# N=2048 (stage 3's attempt predated the Mosaic kernel rework and failed
# to compile), then leave the default bench warm for the driver.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage10] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage9 done" $Q/queue.log; do sleep 120; done
sleep 30

log "fused-edge A/B N=2048 (post-rework)"
BENCH_N=2048 timeout 3600 python bench.py > $Q/fused_edge_2048b.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/fused_edge_2048b.json)"

log "control (factored) N=2048"
BENCH_N=2048 BENCH_FUSED_EDGE=0 timeout 3600 python bench.py \
  > $Q/factored_2048b.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/factored_2048b.json)"

log "final default bench warm"
timeout 3600 python bench.py > $Q/stage10_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/stage10_bench.json)"
log "stage10 done"
