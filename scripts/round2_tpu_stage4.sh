#!/bin/bash
# Round-2 TPU stage 4: after the perf battery, spend remaining TPU time on
# the accuracy lever the trial table points at — a LONG run of the
# best-IRMSD config family (wdec 1e-4, 5-layer shared), then the round-1
# proven lr-1e-4 continuation, with val_repeats-6 denoised selection.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage4] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage3 done" $Q/queue.log; do sleep 60; done
sleep 90

CKPT="checkpts/EQUIDOCK_TPU__drp_0.0#Wdec_0.0001#ITS_lw_10.0#Hdim_64#Nlay_5#shrdLay_T#SURFfs_T#ln_LN#lnX_0#Hnrm_0#NattH_50#skH_0.5#xConnI_0.0#LkySl_0.01#pokOTw_1.0"

log "long stage A: wdec 1e-4 flagship, 90 min"
timeout 6600 python -m equidock_public_tpu.cli.train -toy -data db5 \
  -iegmn_n_lays 5 -shared_layers -lr 2e-4 -w_decay 1e-4 -patience 400 \
  -bs 10 -val_repeats 6 -random_seed 8 \
  -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
  -cache_dir ./cache -checkpoint_dir ./checkpts -compile_cache ./jax_cache \
  -max_seconds 5400 > $Q/stage4_a.log 2>&1
log "stage A exit=$?"

log "long stage B: lr 1e-4 continuation, 60 min"
timeout 4800 python -m equidock_public_tpu.cli.train -toy -data db5 \
  -continue_train_model "$CKPT/db5_model_best" \
  -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 10 -val_repeats 6 -random_seed 9 \
  -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
  -cache_dir ./cache -checkpoint_dir ./checkpts_stage4b \
  -compile_cache ./jax_cache -max_seconds 3600 > $Q/stage4_b.log 2>&1
log "stage B exit=$?"

log "final default bench re-warm"
timeout 3600 python bench.py > $Q/final_default_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/final_default_bench.json)"
log "stage4 done"
