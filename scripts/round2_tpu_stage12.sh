#!/bin/bash
# Round-2 TPU stage 12: batch-size scaling at N=256. The per-op roofline
# (PERF.md) shows the chip is launch-overhead-bound at the paper model's
# D=64/bs=10 — these rows measure how much production throughput is
# recovered by batching wider, the lever the roofline readout identifies.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage12] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage11 done" $Q/queue.log; do sleep 120; done
sleep 30

for BS in 20 40; do
  log "bench bs=$BS N=256"
  BENCH_BS=$BS BENCH_N=256 timeout 3600 python bench.py \
    > "$Q/bench_bs$BS.json" 2>> $Q/bench.err
  log "exit=$? $(cat $Q/bench_bs$BS.json)"
done

log "final default bench warm"
timeout 3600 python bench.py > $Q/stage12_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/stage12_bench.json)"
log "stage12 done"
