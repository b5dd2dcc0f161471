#!/bin/bash
# Round-2 TPU stage 5: clean re-runs of the real-epoch benches. The first
# stage-2 epoch-bench numbers were measured while an unrelated training
# process had accidentally landed on the same (single-client) TPU tunnel
# (the ot_ab script lacked `env -u PALLAS_AXON_POOL_IPS`), so db5/dips epoch
# throughput from stage 2 is suspect. Re-measure with the chip to ourselves.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage5] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage4 done" $Q/queue.log; do sleep 60; done
sleep 90

log "re-run real-epoch bench: db5 (clean chip)"
BENCH_MODE=db5_epoch BENCH_FACTORED=0 BENCH_BUCKETS=512,1024,2048,3072 timeout 5400 python bench.py > $Q/db5_epoch_tpu2.json 2>> $Q/bench.err
log "exit=$? $(tail -c 400 $Q/db5_epoch_tpu2.json)"

log "re-run real-epoch bench: dips synthetic (clean chip)"
BENCH_MODE=dips_epoch BENCH_PAIRS=200 BENCH_FACTORED=0 BENCH_BUCKETS=512,1024,2048,3072 timeout 5400 python bench.py > $Q/dips_epoch_tpu2.json 2>> $Q/bench.err
log "exit=$? $(tail -c 400 $Q/dips_epoch_tpu2.json)"

log "final default bench warm"
timeout 3600 python bench.py > $Q/final_default_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/final_default_bench.json)"
log "stage5 done"
