#!/bin/bash
# Round-3 TPU queue, stage 1: the single-checkpoint-both-metrics campaign
# (VERDICT.md next-round item 1: one checkpoint with frozen-DB5 CRMSD median
# <= 14.2 AND IRMSD median <= 12.1, replicated on >= 2 seeds).
#
# Starting point: stage-14's Hdim-16 3-layer shared trial (s16l3) scored
# 14.01 / 12.48 — already inside the CRMSD bar, 0.4 A short on IRMSD. Stage 1
# replicates that shape with the new `-select_metric sum` (val CRMSD+IRMSD
# selection, denoised by -val_repeats 6) across seeds, plus two
# interface-targeted variants (more keypoints; heavier pocket-OT loss).
#
# Hardening vs the stage-14 script (ADVICE.md items 2-3): verify the train
# cache exists up front, clear the per-trial checkpoint dir before training,
# abort a trial when train exits nonzero, and pick the NEWEST run dir.
set -u
cd /root/repo
Q=results/round3_queue
mkdir -p "$Q"
log() { echo "[r3q] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

CACHE=./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_0/train.npz
if [ ! -f "$CACHE" ]; then
  log "FATAL: train cache missing ($CACHE) — run cli.preprocess first"
  exit 1
fi

run_trial() {
  NAME=$1; SEED=$2; HID=$3; EMB=$4; LAYS=$5; MAXS=$6; shift 6
  log "$NAME: hid=$HID emb=$EMB lays=$LAYS seed=$SEED max_s=$MAXS $*"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 600)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -iegmn_lay_hid_dim "$HID" -residue_emb_dim "$EMB" -iegmn_n_lays "$LAYS" \
    "$@" \
    -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 \
    -val_repeats 6 -select_metric sum \
    -random_seed "$SEED" -max_seconds "$MAXS" \
    -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
    -cache_dir ./cache -checkpoint_dir "./checkpts_small/$NAME" \
    -compile_cache ./jax_cache > "$Q/$NAME.log" 2>&1
  RC=$?
  log "$NAME train exit=$RC"
  if [ "$RC" -ne 0 ]; then log "$NAME: ABORTED (train failed)"; return 1; fi
  CKPT=$(ls -dt ./checkpts_small/$NAME/*/db5_model_best 2>/dev/null | head -1)
  if [ -z "$CKPT" ]; then log "$NAME: no checkpoint"; return 1; fi
  OUT="results/db5_$NAME"
  rm -rf "$OUT"; mkdir -p "$OUT"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 1800 \
    python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
    -input_dir /root/reference/test_sets_pdb/db5_test_random_transformed/random_transformed \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> "$Q/$NAME.log" 2>&1
  SCORE=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 600 \
    python -m equidock_public_tpu.cli.eval_outputs -input_dir "$OUT" \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -method EQUIDOCK_TPU 2>/dev/null | grep num_files)
  log "$NAME score $SCORE"
}

# Stage 1 (~3.5 h): seed replication of the closest shape under sum-selection,
# then the two interface-targeted variants.
run_trial r3_s16l3_s40 40 16 16 3 2700 -shared_layers -num_att_heads 8
run_trial r3_s16l3_s41 41 16 16 3 2700 -shared_layers -num_att_heads 8
run_trial r3_kp16_s40  40 16 16 3 2700 -shared_layers -num_att_heads 16
run_trial r3_ot2_s40   40 16 16 3 2700 -shared_layers -num_att_heads 8 -pocket_ot_loss_weight 2.0
log "stage1 done"
