#!/bin/bash
# Round-4 TPU stage 2: dual-parity campaign on DEVICE-RESIDENT epochs.
# Same avenues as stage 1 (VERDICT r3 item 1: refinement-on-l3, enlarged-val
# selection, stage-8 rerun, OT-reweight) but with -device_resident: epochs
# dropped 46s -> 1.7s (27x; results/round4_queue/resident_probe.log), so each
# trial now converges fully (patience 400 reachable) instead of being
# wall-clock-truncated, and host RSS stays flat (the tunnel-transport leak is
# byte-proportional to host->device traffic, which this path removes).
#
# ADVICE r3 fixes carried over: flock single-instance guard; train/inference
# exit codes logged; empty-score detection; failure counter + non-zero exit
# when everything aborted; one retry on transient TPU-backend errors.
set -u
cd /root/repo
Q=results/round4_queue
mkdir -p $Q
exec 9>$Q/stage2.lock
flock -n 9 || { echo "another stage2 instance is running"; exit 1; }
log() { echo "[r4q2] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }
FAILURES=0
TRIALS=0

CPU_ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"

CACHE=./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_0/train.npz
[ -f "$CACHE" ] || { log "FATAL: cv_0 cache missing"; exit 1; }
BIGVAL_CACHE=./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_4/train.npz
if [ ! -f "$BIGVAL_CACHE" ]; then
  log "building cv_bigval cache (split 4)"
  $CPU_ENV python -m equidock_public_tpu.cli.preprocess -data db5 -split 4 \
    -split_files_path data_splits/cv_bigval -cache_dir ./cache \
    > $Q/preprocess_bigval.log 2>&1
  RC=$?
  [ "$RC" -ne 0 ] && { log "FATAL: bigval preprocess exit=$RC"; exit 1; }
fi
log "caches ready"

score_trial() {
  NAME=$1
  CKPT=$(ls -dt ./checkpts_r4/$NAME/*/db5_model_best 2>/dev/null | head -1)
  if [ -z "$CKPT" ]; then log "$NAME: no checkpoint"; FAILURES=$((FAILURES+1)); return 1; fi
  OUT="results/db5_$NAME"
  rm -rf "$OUT"; mkdir -p "$OUT"
  $CPU_ENV timeout 1800 \
    python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
    -input_dir /root/reference/test_sets_pdb/db5_test_random_transformed/random_transformed \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> "$Q/$NAME.log" 2>&1
  RC=$?
  if [ "$RC" -ne 0 ]; then log "$NAME: inference exit=$RC — score FAILED"; FAILURES=$((FAILURES+1)); return 1; fi
  SCORE=$($CPU_ENV timeout 600 \
    python -m equidock_public_tpu.cli.eval_outputs -input_dir "$OUT" \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -method EQUIDOCK_TPU 2>>"$Q/$NAME.log" | grep num_files)
  if [ -z "$SCORE" ]; then log "$NAME: score FAILED (empty)"; FAILURES=$((FAILURES+1)); return 1; fi
  log "$NAME score $SCORE"
  echo "{\"name\": \"$NAME\", \"stage\": \"r4q2\", \"round\": 4, ${SCORE#\{}" >> results/trial_table.jsonl
}

# _train NAME MAXS [train-cli-flags...] — runs train with one retry on failure
_train() {
  NAME=$1; MAXS=$2; shift 2
  TRIALS=$((TRIALS+1))
  for attempt in 1 2; do
    rm -rf "./checkpts_r4/$NAME"
    timeout $((MAXS + 900)) python -m equidock_public_tpu.cli.train -toy -data db5 \
      "$@" \
      -device_resident -val_repeats 6 -select_metric bar \
      -max_seconds "$MAXS" \
      -cache_dir ./cache -checkpoint_dir "./checkpts_r4/$NAME" \
      -compile_cache ./jax_cache > "$Q/$NAME.log" 2>&1
    RC=$?
    log "$NAME train exit=$RC (attempt $attempt)"
    [ "$RC" -eq 0 ] && { score_trial "$NAME"; return; }
  done
  log "$NAME: ABORTED after 2 attempts"
  FAILURES=$((FAILURES+1))
}

SMALL="-iegmn_lay_hid_dim 16 -residue_emb_dim 16 -iegmn_n_lays 3 -shared_layers -num_att_heads 8"
HYP="-lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024"

log "A: r4_ftl3_s50 — frozen copy-init refinement on small_l3 (resident)"
_train r4_ftl3_s50 2400 \
  -fine_tune_from artifacts/db5_model_small_l3 -freeze_original -fine_tune_init copy \
  $HYP -random_seed 50

log "B: r4_bigval_s52 — s16l3 on cv_bigval (55-complex val, resident)"
_train r4_bigval_s52 2700 \
  $SMALL $HYP -random_seed 52 -split 4 -split_files_path data_splits/cv_bigval

log "A: r4_ftl3_s51"
_train r4_ftl3_s51 2400 \
  -fine_tune_from artifacts/db5_model_small_l3 -freeze_original -fine_tune_init copy \
  $HYP -random_seed 51

log "B: r4_bigval_s53"
_train r4_bigval_s53 2700 \
  $SMALL $HYP -random_seed 53 -split 4 -split_files_path data_splits/cv_bigval

log "C: r4_barsel_s40 — rerun of the lost stage-8 trial (resident)"
_train r4_barsel_s40 2700 $SMALL $HYP -random_seed 40

log "D: r4_otw2_s54 — pocket-OT weight 2"
_train r4_otw2_s54 2700 $SMALL $HYP -random_seed 54 -pocket_ot_loss_weight 2.0

log "stage2 done: $FAILURES/$TRIALS failed"
[ "$FAILURES" -lt "$TRIALS" ] || exit 1
