#!/bin/bash
# Round-3 TPU queue, stage 2: asymmetric capacity (VERDICT.md item 1, avenue a).
#
# Stage-1 result: replicating the Hdim-16 3-layer shape under sum-selection
# did NOT unify the metrics (best 14.80/12.36; ot2 15.06/12.16) — small-trunk
# seeds are too noisy on CRMSD. Stage 2 flips the split: keep the 64-dim
# 5-layer shared trunk that holds the CRMSD record (artifacts/db5_model_best,
# 14.29/15.09, lr 2e-4 wd 1e-3 bs 10 seed 8) and shrink ONLY the keypoint
# head to the small model's K=8 (num_att_heads == #keypoints). Round-2
# per-complex analysis says capacity helps global placement and hurts
# interface geometry; K is the head's only capacity knob.
set -u
cd /root/repo
Q=results/round3_queue
mkdir -p "$Q"
log() { echo "[r3q2] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

CACHE=./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_0/train.npz
if [ ! -f "$CACHE" ]; then
  log "FATAL: train cache missing ($CACHE) — run cli.preprocess first"
  exit 1
fi

run_trial() {
  NAME=$1; SEED=$2; HEADS=$3; MAXS=$4; shift 4
  log "$NAME: 64/64/5 shared heads=$HEADS seed=$SEED max_s=$MAXS $*"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 600)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -iegmn_lay_hid_dim 64 -residue_emb_dim 64 -iegmn_n_lays 5 -shared_layers \
    -num_att_heads "$HEADS" \
    "$@" \
    -lr 2e-4 -w_decay 1e-3 -patience 400 -bs 10 \
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

# Stage 2 (~3 h): K=8 head on the CRMSD-record trunk, 3 seeds (incl. the
# record's own seed 8), + one heavier-pocket-OT variant.
run_trial r3_asym_s8  8  8 2400
run_trial r3_asym_s40 40 8 2400
run_trial r3_asym_s41 41 8 2400
run_trial r3_asym_ot2_s8 8 8 2400 -pocket_ot_loss_weight 2.0
log "stage2 done"
