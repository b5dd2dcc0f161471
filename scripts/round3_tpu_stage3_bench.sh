#!/bin/bash
# Round-3 TPU stage 3: packed-epoch throughput measurement (VERDICT item 3's
# second Done criterion: real DB5 epoch >= 2x the round-2 20.0 pairs/s).
# Waits for stage 2 to release the TPU, then runs the epoch benches
# packed vs unpacked at the fine (step-64-ish) bucket set the padding
# report recommended, plus the standard headline bench.
set -u
cd /root/repo
Q=results/round3_queue
log() { echo "[r3q3] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

# wait for stage 2 (poll the queue log; the queue process exits after it)
while ! grep -q "stage2 done" $Q/queue.log; do sleep 60; done
log "stage3: TPU free, running packed-epoch benches"

FINE=64,128,192,256,320,384,448,512,640,768,1024,1536,2048,3072
COARSE=512,1024,2048,3072

run() { # name, env...
  NAME=$1; shift
  OUT=$(env "$@" timeout 2400 python bench.py 2>/dev/null | tail -1)
  log "bench $NAME $OUT"
  echo "$OUT" >> $Q/stage3_bench.jsonl
}

run db5_unpacked_coarse BENCH_MODE=db5_epoch BENCH_BUCKETS=$COARSE
run db5_unpacked_fine   BENCH_MODE=db5_epoch BENCH_BUCKETS=$FINE
run db5_packed_c10      BENCH_MODE=db5_epoch BENCH_BUCKETS=$FINE BENCH_PACK=10
run db5_packed_c10_coarse BENCH_MODE=db5_epoch BENCH_BUCKETS=$COARSE BENCH_PACK=10
run dips_packed_c10     BENCH_MODE=dips_epoch BENCH_BUCKETS=$FINE BENCH_PACK=10
run dips_unpacked       BENCH_MODE=dips_epoch BENCH_BUCKETS=$FINE
run headline            BENCH_MODE=
log "stage3 done"
