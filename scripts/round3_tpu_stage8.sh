#!/bin/bash
# Round-3 TPU stage 8: resume runner after the VM restart killed the queue
# between stage 5 (last trial r3_distill_a7_s8 lost mid-train) and stage 6.
# Re-runs, in priority order for an uncertain wall budget:
#   1-2. the two stage-6 avenues closest to the dual-parity bar
#        (bar-selection s16l3 retry; copy-init frozen refinement),
#   3-4. their second seeds,
#   5.   the lost stage-5 distill a=0.7 trial,
#   6.   the corrected (warmed) packed-epoch benches from stage 6.
# No queue.log gating: the TPU is idle on this fresh VM.
set -u
cd /root/repo
Q=results/round3_queue
log() { echo "[r3q8] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }
log "stage8: resume after VM restart (caches cold: feature cache + jax_cache rebuilt on first trial)"

# The feature cache is gitignored and died with the VM; wait for
# `make preprocess` (launched alongside this queue) rather than letting
# every trial fail fast on a missing npz (the round-2 stage-14 lesson).
CACHE=./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_0/train.npz
for _ in $(seq 1 240); do [ -f "$CACHE" ] && break; sleep 15; done
if [ ! -f "$CACHE" ]; then
  log "FATAL: train cache still missing after 1h ($CACHE)"
  exit 1
fi
log "stage8: feature cache present, starting trials"

run_trial() {
  NAME=$1; SEED=$2; HID=$3; EMB=$4; LAYS=$5; MAXS=$6; shift 6
  log "$NAME: hid=$HID emb=$EMB lays=$LAYS seed=$SEED select=bar $*"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 900)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -iegmn_lay_hid_dim "$HID" -residue_emb_dim "$EMB" -iegmn_n_lays "$LAYS" \
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
  score_trial "$NAME"
}

run_ft_copy() {
  NAME=$1; SEED=$2; MAXS=$3
  log "$NAME: fine_tune_from=small_s2 copy-init frozen seed=$SEED select=bar"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 900)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -fine_tune_from artifacts/db5_model_small_s2 -freeze_original \
    -fine_tune_init copy \
    -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 \
    -val_repeats 6 -select_metric bar \
    -random_seed "$SEED" -max_seconds "$MAXS" \
    -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
    -cache_dir ./cache -checkpoint_dir "./checkpts_small/$NAME" \
    -compile_cache ./jax_cache > "$Q/$NAME.log" 2>&1
  RC=$?
  log "$NAME train exit=$RC"
  if [ "$RC" -ne 0 ]; then log "$NAME: ABORTED (train failed)"; return 1; fi
  score_trial "$NAME"
}

score_trial() {
  NAME=$1
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

run_trial r3_barsel_s16l3_s40 40 16 16 3 2700 -shared_layers -num_att_heads 8
run_ft_copy r3_ftcopy_frozen_s40 40 2400
run_trial r3_barsel_s16l3_s42 42 16 16 3 2700 -shared_layers -num_att_heads 8
run_ft_copy r3_ftcopy_frozen_s41 41 2400
if [ -f results/distill/teacher_small/.done ]; then
  run_trial r3_distill_a7_s8 8 64 64 5 2400 -shared_layers -num_att_heads 50 \
    -distill_dir results/distill/teacher_small -distill_alpha 0.7
else
  log "distill_a7 skipped: teacher set lost with the VM (results/distill gitignored); a3/a5 already showed the avenue fails the bar"
fi
log "stage8 trials done"

# Corrected packed-vs-unpacked epoch A/B (stage-3 timed compile noise on
# fresh shapes): warm 4 shuffled epochs for shape-set closure, time 2.
FINE=64,128,192,256,320,384,448,512,640,768,1024,1536,2048,3072
COARSE=512,1024,2048,3072
runb() {
  NAME=$1; shift
  OUT=$(env "$@" BENCH_WARM_EPOCHS=4 BENCH_TIMED_EPOCHS=2 timeout 3000 python bench.py 2>/dev/null | tail -1)
  log "benchv2 $NAME $OUT"
  echo "{\"name\": \"$NAME\", \"row\": $OUT}" >> $Q/stage8_bench.jsonl
}
runb db5_unpacked_coarse BENCH_MODE=db5_epoch BENCH_BUCKETS=$COARSE
runb db5_packed_c10      BENCH_MODE=db5_epoch BENCH_BUCKETS=$FINE BENCH_PACK=10
runb db5_packed_c10_coarse BENCH_MODE=db5_epoch BENCH_BUCKETS=$COARSE BENCH_PACK=10
runb dips_unpacked       BENCH_MODE=dips_epoch BENCH_BUCKETS=$FINE
runb dips_packed_c10     BENCH_MODE=dips_epoch BENCH_BUCKETS=$FINE BENCH_PACK=10
log "stage8 benches done"
log "stage8 done"
