#!/bin/bash
# Round-2 TPU stage 2: waits for the hyper-search queue to finish, then runs
# the performance measurement battery sequentially on the single TPU chip
# (the tunnel is single-client — never two TPU processes at once).
cd /root/repo
Q=results/round2_queue
log() { echo "[stage2] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "TPU queue2 done" $Q/queue.log; do sleep 60; done
sleep 90   # let the tunnel settle after the last trial exits

log "edge-path roofline (bench_edge_path.py)"
timeout 5400 python bench_edge_path.py > $Q/edge_path_tpu.json 2> $Q/edge_path_tpu.err
log "edge-path exit=$?"

log "fused-edge A/B N=1024"
BENCH_N=1024 BENCH_FUSED_EDGE=1 timeout 3600 python bench.py > $Q/fused_edge_1024.json 2>> $Q/bench.err
log "exit=$? $(tail -c 300 $Q/fused_edge_1024.json)"
log "factored baseline N=1024 (same code vintage)"
BENCH_N=1024 timeout 3600 python bench.py > $Q/factored_1024.json 2>> $Q/bench.err
log "exit=$? $(tail -c 300 $Q/factored_1024.json)"

log "fused-edge A/B N=2048"
BENCH_N=2048 BENCH_FUSED_EDGE=1 timeout 3600 python bench.py > $Q/fused_edge_2048.json 2>> $Q/bench.err
log "exit=$? $(tail -c 300 $Q/fused_edge_2048.json)"
log "factored baseline N=2048"
BENCH_N=2048 timeout 3600 python bench.py > $Q/factored_2048.json 2>> $Q/bench.err
log "exit=$? $(tail -c 300 $Q/factored_2048.json)"

log "real-epoch bench: db5 (coarse buckets, non-factored = trained-config cache hits)"
BENCH_MODE=db5_epoch BENCH_FACTORED=0 BENCH_BUCKETS=512,1024,2048,3072 timeout 5400 python bench.py > $Q/db5_epoch_tpu.json 2>> $Q/bench.err
log "exit=$? $(tail -c 400 $Q/db5_epoch_tpu.json)"

log "real-epoch bench: dips synthetic (coarse buckets)"
BENCH_MODE=dips_epoch BENCH_PAIRS=200 BENCH_FACTORED=0 BENCH_BUCKETS=512,1024,2048,3072 timeout 7200 python bench.py > $Q/dips_epoch_tpu.json 2>> $Q/bench.err
log "exit=$? $(tail -c 400 $Q/dips_epoch_tpu.json)"

log "final default bench warm (the driver's end-of-round command)"
timeout 3600 python bench.py > $Q/final_default_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/final_default_bench.json)"
log "stage2 done"
