#!/bin/bash
# Round-5 TPU queue — executes the pre-registered protocol's trials
# (results/ROUND5_PROTOCOL.md) plus the two full-convergence 64-dim finals
# (VERDICT r4 item 2) and the end-of-queue bench block.
#
# Order is chosen so the protocol's fallback tiers degrade gracefully if the
# tunnel eats wall-clock: fold0, final-seed-70, fold1, fold2, fold3,
# final-seed-71, benches. Fold twins are NEVER scored on the frozen test
# (their split's test.txt IS the fold); only the finals are (MEMBER-CHAR,
# auto-appended to the trial table; ledger row added when observed).
#
# Same safety net as round 4 (scripts/round4_tpu_stage3.sh): tiny-jit probe
# gate before every TPU process, checkpoint-preserving retries, exact-PID
# watchdog (scripts/trainer_watchdog.py) run alongside by the launcher.
set -u
cd /root/repo
Q=results/round5_queue
mkdir -p $Q ./checkpts_r5
exec 9>$Q/queue.lock
flock -n 9 || { echo "another round5 queue is running"; exit 1; }
log() { echo "[r5q] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }
FAILURES=0
TRIALS=0

CPU_ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
DB5_TEST=/root/reference/test_sets_pdb/db5_test_random_transformed

probe_tpu() {
  for i in $(seq 1 40); do
    timeout 420 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
print('tpu ok', float(x))" >> $Q/probe.log 2>&1 && return 0
    log "tpu probe failed/hung (try $i/40); sleeping 120s"
    sleep 120
  done
  log "tpu unreachable after 40 probes"
  return 1
}

score_db5() {  # NAME CKPT — frozen-test MEMBER-CHAR scoring (finals only)
  NAME=$1; CKPT=$2
  OUT="results/db5_$NAME"
  rm -rf "$OUT"; mkdir -p "$OUT"
  $CPU_ENV timeout 2400 \
    python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
    -input_dir $DB5_TEST/random_transformed \
    -ground_truth_dir $DB5_TEST/complexes \
    -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> "$Q/$NAME.log" 2>&1
  RC=$?
  if [ "$RC" -ne 0 ]; then log "$NAME: db5 inference exit=$RC — score FAILED"; return 1; fi
  SCORE=$($CPU_ENV timeout 600 \
    python -m equidock_public_tpu.cli.eval_outputs -input_dir "$OUT" \
    -ground_truth_dir $DB5_TEST/complexes \
    -method EQUIDOCK_TPU 2>>"$Q/$NAME.log" | grep num_files)
  if [ -z "$SCORE" ]; then log "$NAME: db5 score FAILED (empty)"; return 1; fi
  log "$NAME db5 score $SCORE"
  echo "{\"name\": \"$NAME\", \"stage\": \"r5q\", \"round\": 5, \"label\": \"MEMBER-CHAR\", ${SCORE#\{}" >> results/trial_table.jsonl
}

best_ckpt() { ls -dt ./checkpts_r5/$1*/*/db5_model_best 2>/dev/null | head -1; }

# _train NAME MAXS [flags...] — probe-gated, checkpoint-preserving retries
# A $Q/STOP file ends the queue between trials (clean TPU handoff, e.g. for
# an end-of-session bench run) without killing an in-flight training.
_train() {
  NAME=$1; MAXS=$2; shift 2
  if [ -f "$Q/STOP" ]; then log "$NAME: STOP file present — not starting"; return 1; fi
  TRIALS=$((TRIALS+1))
  if [ -n "$(best_ckpt "$NAME")" ]; then
    log "$NAME: checkpoint already exists — skipping (resume case)"
    return 0
  fi
  for attempt in 1 2 3; do
    probe_tpu || { FAILURES=$((FAILURES+1)); return 1; }
    if [ -d "./checkpts_r5/$NAME" ]; then
      mv "./checkpts_r5/$NAME" "./checkpts_r5/${NAME}_try$attempt.$$"
    fi
    timeout $((MAXS + 900)) python -m equidock_public_tpu.cli.train -toy -data db5 \
      "$@" \
      -device_resident -val_repeats 6 \
      -max_seconds "$MAXS" \
      -cache_dir ./cache -checkpoint_dir "./checkpts_r5/$NAME" \
      -compile_cache ./jax_cache > "$Q/$NAME.log" 2>&1
    RC=$?
    log "$NAME train exit=$RC (attempt $attempt)"
    [ "$RC" -eq 0 ] && break
  done
  if [ -z "$(best_ckpt "$NAME")" ]; then
    log "$NAME: no checkpoint from any attempt"; FAILURES=$((FAILURES+1)); return 1
  fi
  return 0
}

# Protocol twin recipes (results/ROUND5_PROTOCOL.md — fixed)
ARCH_A="-iegmn_lay_hid_dim 64 -residue_emb_dim 64 -iegmn_n_lays 5 -shared_layers -num_att_heads 50"
HYP_A="-lr 2e-4 -w_decay 1e-3 -bs 10 -patience 400"
ARCH_B="-iegmn_lay_hid_dim 16 -residue_emb_dim 16 -iegmn_n_lays 2 -num_att_heads 8"
ARCH_C="-iegmn_lay_hid_dim 16 -residue_emb_dim 16 -iegmn_n_lays 3 -shared_layers -num_att_heads 8"
HYP_BC="-lr 1e-4 -w_decay 1e-4 -bs 4 -patience 400"
BUCKETS="-node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024"

fold() {  # fold F — train the three twins
  F=$1
  SPLIT="-split $((10+F)) -split_files_path data_splits/cv_fold$F"
  log "fold$F: twin A (64d 5-lay shared, seed $((80+F)))"
  _train r5_fold${F}_A 2400 $ARCH_A $HYP_A $BUCKETS $SPLIT -random_seed $((80+F))
  log "fold$F: twin B (16d 2-lay, seed $((84+F)))"
  _train r5_fold${F}_B 2100 $ARCH_B $HYP_BC $BUCKETS $SPLIT -random_seed $((84+F))
  log "fold$F: twin C (16d 3-lay shared, seed $((88+F)))"
  _train r5_fold${F}_C 2100 $ARCH_C $HYP_BC $BUCKETS $SPLIT -random_seed $((88+F))
  touch $Q/fold${F}.done
}

final64() {  # full-convergence 64-dim cv_0 final (VERDICT item 2)
  SEED=$1
  log "final64 seed $SEED (full cv_0, cap 3900s)"
  _train r5_final64_s$SEED 3900 $ARCH_A $HYP_A $BUCKETS -random_seed $SEED \
    && score_db5 r5_final64_s$SEED "$(best_ckpt r5_final64_s$SEED)"
  touch $Q/final_s$SEED.done
}

log "round5 queue start"

# Fresh-clone robustness: the feature caches are gitignored, so build any
# missing split cache up front (CPU, ~2 min for all five splits).
build_caches() {
  for F in 0 1 2 3; do
    [ -f "./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_$((10+F))/train.npz" ] || \
      $CPU_ENV timeout 900 python -m equidock_public_tpu.cli.preprocess \
        -split $((10+F)) -split_files_path data_splits/cv_fold$F \
        -cache_dir ./cache -n_jobs 8 val train test >> $Q/preprocess.log 2>&1
  done
  [ -f "./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_0/train.npz" ] || \
    $CPU_ENV timeout 900 python -m equidock_public_tpu.cli.preprocess \
      -cache_dir ./cache -n_jobs 8 val train test >> $Q/preprocess.log 2>&1
  log "caches ready"
}
build_caches

fold 0
final64 70
fold 1
fold 2
fold 3
final64 71

# ---- bench block (warms the driver's jax_cache for BENCH_r05) --------------
log "BENCH: default driver bench"
probe_tpu && timeout 3600 python bench.py > $Q/default_bench.json 2> $Q/default_bench.err
log "default bench exit=$? $(cat $Q/default_bench.json 2>/dev/null | tr -d '\n')"

log "queue done: $FAILURES failures / $TRIALS trials"
[ "$FAILURES" -lt "$TRIALS" ] || exit 1
