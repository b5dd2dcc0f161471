#!/bin/bash
# Round-2 TPU stage 9 (optional tail): edge-path roofline rerun including
# the fused-backward rows, then a second-seed real-DIPS->DB5 curriculum for
# a variance estimate. Touch results/round2_queue/STOP_STAGE9 to cancel.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage9] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage8 done" $Q/queue.log; do sleep 120; done
sleep 30
[ -f $Q/STOP_STAGE9 ] && { log "cancelled"; exit 0; }

log "edge-path roofline rerun (incl. fused-bwd rows)"
timeout 5400 python bench_edge_path.py \
  > $Q/edge_path_tpu3.json 2> $Q/edge_path_tpu3.err
log "roofline exit=$?"

[ -f $Q/STOP_STAGE9 ] && { log "cancelled before seed-2"; exit 0; }

log "9b: second-seed DIPS pretrain (45 min)"
timeout 3600 python -m equidock_public_tpu.cli.train -data dips \
  -iegmn_n_lays 5 -shared_layers -lr 2e-4 -w_decay 1e-3 -patience 150 \
  -bs 10 -val_repeats 3 -random_seed 21 \
  -node_buckets 512,1024,2048 -pocket_buckets 256,512,1024 \
  -cache_dir ./cache -checkpoint_dir ./checkpts_rdips_s2 \
  -compile_cache ./jax_cache -max_seconds 2700 > $Q/stage9_dips.log 2>&1
log "9b exit=$?"

CKPT=$(ls -d checkpts_rdips_s2/*/dips_model_best 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then log "9b produced no checkpoint; stopping"; exit 1; fi

log "9c: second-seed DB5 fine-tune (90 min)"
timeout 7200 python -m equidock_public_tpu.cli.train -toy -data db5 \
  -continue_train_model "$CKPT" \
  -lr 1e-4 -w_decay 1e-3 -patience 400 -bs 10 -val_repeats 6 \
  -random_seed 22 \
  -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
  -cache_dir ./cache -checkpoint_dir ./checkpts_rdips_db5_s2 \
  -compile_cache ./jax_cache -max_seconds 5400 > $Q/stage9_db5.log 2>&1
log "9c exit=$?"

log "final default bench warm"
timeout 3600 python bench.py > $Q/stage9_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/stage9_bench.json)"
log "stage9 done"
