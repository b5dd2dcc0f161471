#!/bin/bash
# Round-3 TPU stage 4: the fine-tune avenue (VERDICT item 1, avenue c).
# Warm-start a 2-layer refinement stage on top of each committed parent:
#  - small trunk (IRMSD 11.94, CRMSD 16.13): refinement should fix global
#    placement while the frozen trunk keeps interface accuracy;
#  - best trunk (CRMSD 14.29, IRMSD 15.09): refinement targets the interface.
# Selection on val CRMSD+IRMSD sum, val_repeats 6.
set -u
cd /root/repo
Q=results/round3_queue
log() { echo "[r3q4] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage3 done" $Q/queue.log; do sleep 60; done
log "stage4: TPU free, fine-tune trials"

run_ft() {
  NAME=$1; FROM=$2; SEED=$3; MAXS=$4; shift 4
  log "$NAME: fine_tune_from=$FROM seed=$SEED max_s=$MAXS $*"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 600)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -fine_tune_from "$FROM" \
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

SMALL=artifacts/db5_model_small_s2
BEST=artifacts/db5_model_best
run_ft r3_ft_small_frozen  $SMALL 40 2400 -freeze_original
run_ft r3_ft_small_open    $SMALL 40 2400
run_ft r3_ft_best_frozen   $BEST  40 2400 -freeze_original
run_ft r3_ft_small_frozen_s41 $SMALL 41 2400 -freeze_original
log "stage4 done"
