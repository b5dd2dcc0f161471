#!/bin/bash
# Round-3 TPU stage 5: distillation trials (VERDICT item 1, avenue b).
# The small model's train-split poses (teacher, IRMSD champion) are blended
# into the coordinate target of the 64-dim trunk recipe (CRMSD champion):
# capacity handles global placement, the teacher pulls the interface.
set -u
cd /root/repo
Q=results/round3_queue
log() { echo "[r3q5] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage4 done" $Q/queue.log; do sleep 60; done
TEACH=results/distill/teacher_small
if [ ! -f "$TEACH/.done" ]; then
  log "stage5: teacher poses missing — waiting"
  while [ ! -f "$TEACH/.done" ]; do sleep 120; done
fi
log "stage5: TPU free, distillation trials"

run_trial() {
  NAME=$1; SEED=$2; ALPHA=$3; MAXS=$4; shift 4
  log "$NAME: 64/64/5 shared heads=50 distill_alpha=$ALPHA seed=$SEED $*"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 600)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -iegmn_lay_hid_dim 64 -residue_emb_dim 64 -iegmn_n_lays 5 -shared_layers \
    -num_att_heads 50 \
    -distill_dir "$TEACH" -distill_alpha "$ALPHA" \
    "$@" \
    -lr 2e-4 -w_decay 1e-3 -patience 400 -bs 10 \
    -val_repeats 6 -select_metric bar \
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

run_trial r3_distill_a3_s8  8  0.3 2400
run_trial r3_distill_a5_s8  8  0.5 2400
run_trial r3_distill_a3_s40 40 0.3 2400
run_trial r3_distill_a7_s8  8  0.7 2400
log "stage5 done"
