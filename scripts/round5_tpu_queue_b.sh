#!/bin/bash
# Round-5 TPU queue, phase B — wall-clock-aware re-sequencing of
# scripts/round5_tpu_queue.sh (same trial recipes, caps, and seeds; only the
# ORDER changes — the protocol fixes recipes and selection rules, not queue
# order, and its own fallback tiers anticipate wall-clock loss).
#
# Rationale: the session budget fits two folds + the driver-bench warmup +
# the single registered shot, OR one fold + one 64-dim final — not both.
# The registered dual-bar shot (protocol primary goal; minimum 2 folds)
# outranks the MEMBER-CHAR finals, so: fold0, fold1, BENCH (warms
# ./jax_cache for the driver's BENCH_r05 run), then folds 2/3 + finals with
# whatever wall-clock remains. A $Q/STOP file still ends trials cleanly.
#
# Waits for any in-flight cli.train process (the phase-A fold0 twin) to
# finish before starting; _train skips trials whose checkpoint exists.
set -u
cd /root/repo
Q=results/round5_queue
mkdir -p $Q ./checkpts_r5
exec 9>$Q/queue_b.lock
flock -n 9 || { echo "another round5 queue_b is running"; exit 1; }
log() { echo "[r5qB] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }
FAILURES=0
TRIALS=0

CPU_ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
DB5_TEST=/root/reference/test_sets_pdb/db5_test_random_transformed

wait_for_tpu_idle() {
  while pgrep -f "equidock_public_tpu.cli.train" > /dev/null 2>&1; do
    sleep 30
  done
  log "no in-flight trainer; proceeding"
}

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

# _train NAME MAXS [flags...] — probe-gated, checkpoint-preserving retries;
# $Q/STOP ends the queue between trials without killing an in-flight run.
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
  if [ -f "$Q/STOP" ]; then log "final64 s$SEED: STOP present — skipping"; return 1; fi
  log "final64 seed $SEED (full cv_0, cap 3900s)"
  _train r5_final64_s$SEED 3900 $ARCH_A $HYP_A $BUCKETS -random_seed $SEED \
    && score_db5 r5_final64_s$SEED "$(best_ckpt r5_final64_s$SEED)"
  touch $Q/final_s$SEED.done
}

log "round5 queue_b start (order: fold0 fold1 BENCH final70 fold2 fold3 final71)"
wait_for_tpu_idle
fold 0
fold 1

# ---- bench block (warms the driver's jax_cache for BENCH_r05) --------------
log "BENCH: default driver bench"
probe_tpu && timeout 5400 python bench.py > $Q/default_bench.json 2> $Q/default_bench.err
log "default bench exit=$? $(cat $Q/default_bench.json 2>/dev/null | tr -d '\n')"
touch $Q/bench.done

final64 70
fold 2
fold 3
final64 71

log "queue_b done: $FAILURES failures / $TRIALS trials"
[ "$FAILURES" -lt "$TRIALS" ] || exit 1
