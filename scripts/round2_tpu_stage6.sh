#!/bin/bash
# Round-2 TPU stage 6: the REAL-data DIPS->DB5 curriculum (VERDICT item 3).
# Pretrain on the 100 real DIPS bound complexes (frozen-test structures —
# the only real DIPS data mounted; leakage caveat in data/dips.py means the
# result must only be scored on DB5), then fine-tune DB5 from that
# checkpoint and evaluate on the frozen DB5 test set (clean).
# Reference recipe being followed: train.py:263-285 (DIPS lr 2e-4 then DB5
# lr 1e-4), db5 paper-model hyperparameters (5 layers shared, skip 0.5,
# wdec 1e-3 — inference_rigid.py:90-94).
cd /root/repo
Q=results/round2_queue
log() { echo "[stage6] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

log "6a: DIPS pretrain on real frozen cache (80 pairs), 70 min budget"
timeout 5400 python -m equidock_public_tpu.cli.train -data dips \
  -iegmn_n_lays 5 -shared_layers -lr 2e-4 -w_decay 1e-3 -patience 150 \
  -bs 10 -val_repeats 3 -random_seed 11 \
  -node_buckets 512,1024,2048 -pocket_buckets 256,512,1024 \
  -cache_dir ./cache -checkpoint_dir ./checkpts_rdips \
  -compile_cache ./jax_cache -max_seconds 4200 > $Q/stage6_dips.log 2>&1
log "6a exit=$?"

CKPT=$(ls -d checkpts_rdips/*/dips_model_best 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then log "6a produced no checkpoint; aborting"; exit 1; fi

log "6b: DB5 fine-tune from $CKPT, 150 min budget"
timeout 10800 python -m equidock_public_tpu.cli.train -toy -data db5 \
  -continue_train_model "$CKPT" \
  -lr 1e-4 -w_decay 1e-3 -patience 400 -bs 10 -val_repeats 6 \
  -random_seed 12 \
  -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
  -cache_dir ./cache -checkpoint_dir ./checkpts_rdips_db5 \
  -compile_cache ./jax_cache -max_seconds 9000 > $Q/stage6_db5.log 2>&1
log "6b exit=$?"

log "6c: default bench re-warm"
timeout 3600 python bench.py > $Q/stage6_bench.json 2>> $Q/bench.err
log "6c exit=$? $(cat $Q/stage6_bench.json)"
log "stage6 done"
