#!/bin/bash
# Round-3 TPU stage 7: REVERSE distillation — the 64-dim CRMSD champion
# teaches the small (IRMSD-champion) trunk global placement. Forward
# distillation (stage 5) moved the 64-dim trunk to CRMSD 14.15 (record)
# but its interface stayed weak; the reverse direction starts from the
# trunk whose interface is already at parity.
set -u
cd /root/repo
Q=results/round3_queue
log() { echo "[r3q7] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage6 done" $Q/queue.log; do sleep 60; done
TEACH=results/distill/teacher_best
while [ ! -f "$TEACH/.done" ]; do sleep 120; done
log "stage7: TPU free, reverse-distillation trials"

run_trial() {
  NAME=$1; SEED=$2; ALPHA=$3; MAXS=$4; shift 4
  log "$NAME: hid=16 lays=2 unshared heads=8 distill_alpha=$ALPHA seed=$SEED $*"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 600)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -iegmn_lay_hid_dim 16 -residue_emb_dim 16 -iegmn_n_lays 2 \
    -num_att_heads 8 \
    -distill_dir "$TEACH" -distill_alpha "$ALPHA" \
    "$@" \
    -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 \
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

run_trial r3_rdistill_a3_s31 31 0.3 2400
run_trial r3_rdistill_a5_s31 31 0.5 2400
run_trial r3_rdistill_a3_s40 40 0.3 2400
log "stage7 done"
