#!/bin/bash
# Round-2 TPU stage 3: waits for stage 2 to finish, then re-runs the items
# that failed on the Mosaic gather-lowering bug (fixed in
# ops/pallas/edge_message.py: take_along_axis-form gather -> tpu.dynamic_gather):
# the edge-path roofline and the fused-edge A/Bs. Single TPU client at a time.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage3] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage2 done" $Q/queue.log; do sleep 60; done
sleep 90

log "edge-path roofline retry (fixed gather)"
timeout 7200 python bench_edge_path.py > $Q/edge_path_tpu.json 2> $Q/edge_path_tpu.err
log "edge-path exit=$?"

log "fused-edge A/B N=1024 retry"
BENCH_N=1024 BENCH_FUSED_EDGE=1 timeout 3600 python bench.py > $Q/fused_edge_1024.json 2>> $Q/bench.err
log "exit=$? $(tail -c 300 $Q/fused_edge_1024.json)"

log "fused-edge A/B N=2048 retry"
BENCH_N=2048 BENCH_FUSED_EDGE=1 timeout 3600 python bench.py > $Q/fused_edge_2048.json 2>> $Q/bench.err
log "exit=$? $(tail -c 300 $Q/fused_edge_2048.json)"

log "fused-edge A/B N=256 (crossover check)"
BENCH_N=256 BENCH_FUSED_EDGE=1 timeout 3600 python bench.py > $Q/fused_edge_256.json 2>> $Q/bench.err
log "exit=$? $(tail -c 300 $Q/fused_edge_256.json)"

log "final default bench warm (driver end-of-round cache)"
timeout 3600 python bench.py > $Q/final_default_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/final_default_bench.json)"
log "stage3 done"
