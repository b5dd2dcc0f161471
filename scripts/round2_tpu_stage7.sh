#!/bin/bash
# Round-2 TPU stage 7: train-step A/B for the fused Pallas edge-message
# BACKWARD kernel (BENCH_FUSED_EDGE_BWD) at N=256 and N=1024, with
# same-vintage controls. Runs after the stage-6 curriculum finishes so the
# tunnel chip is never shared.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage7] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage6 done" $Q/queue.log; do sleep 120; done
sleep 30

log "fused-bwd A/B N=256"
BENCH_FUSED_EDGE_BWD=1 timeout 3600 python bench.py \
  > $Q/fused_bwd_256.json 2> $Q/fused_bwd_256.err
log "exit=$? $(cat $Q/fused_bwd_256.json)"

log "control (XLA-recompute bwd) N=256"
timeout 3600 python bench.py > $Q/fused_bwd_ctl_256.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/fused_bwd_ctl_256.json)"

log "fused-bwd A/B N=1024"
BENCH_FUSED_EDGE_BWD=1 BENCH_N=1024 timeout 3600 python bench.py \
  > $Q/fused_bwd_1024.json 2> $Q/fused_bwd_1024.err
log "exit=$? $(cat $Q/fused_bwd_1024.json)"

log "control N=1024"
BENCH_N=1024 timeout 3600 python bench.py \
  > $Q/fused_bwd_ctl_1024.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/fused_bwd_ctl_1024.json)"

log "stage7 done"
