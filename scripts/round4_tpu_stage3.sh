#!/bin/bash
# Round-4 TPU stage 3: replaces stage 2 after the 07:41 tunnel stall (trainer
# froze mid-epoch after 141 healthy resident epochs; backend-side, not
# framework-side — the identical scan program had run 141 times).
#
# Improvements over stage 2:
#   * probe_tpu gate before every attempt: a tiny jit must complete, so a
#     wedged tunnel is detected in minutes (not burned as a 55-min timeout),
#     and trials wait for recovery instead of aborting.
#   * retries PRESERVE checkpoints (mv aside, never rm -rf a dir that may
#     hold a best-so-far) and scoring falls back to the newest surviving one.
#   * new CROP stage: the corpus-size-vs-realism study (VERDICT r3 missing
#     item 2) — pretrain on the 16K interface-crop corpus (-data dips,
#     device-resident), fine-tune on DB5, score DB5 + zero-shot frozen-DIPS
#     for both stages.
#   * end-of-queue bench block: edge_sol ceilings, resident real-epoch line,
#     packed+fused vs packed-XLA A/B (all warm the driver's jax_cache).
set -u
cd /root/repo
Q=results/round4_queue
mkdir -p $Q
exec 9>$Q/stage3.lock
flock -n 9 || { echo "another stage3 instance is running"; exit 1; }
log() { echo "[r4q3] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }
FAILURES=0
TRIALS=0

CPU_ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
DB5_TEST=/root/reference/test_sets_pdb/db5_test_random_transformed
DIPS_TEST=/root/reference/test_sets_pdb/dips_test_random_transformed

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

# score_db5 NAME CKPT_GLOB — inference+eval on the frozen DB5 test (CPU)
score_db5() {
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
  echo "{\"name\": \"$NAME\", \"stage\": \"r4q3\", \"round\": 4, ${SCORE#\{}" >> results/trial_table.jsonl
}

# score_dips NAME CKPT — zero-shot on the frozen DIPS test (CPU)
score_dips() {
  NAME=$1; CKPT=$2
  OUT="results/dips_$NAME"
  rm -rf "$OUT"; mkdir -p "$OUT"
  $CPU_ENV timeout 3600 \
    python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
    -input_dir $DIPS_TEST/random_transformed \
    -ground_truth_dir $DIPS_TEST/complexes \
    -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> "$Q/$NAME.log" 2>&1
  RC=$?
  if [ "$RC" -ne 0 ]; then log "$NAME: dips inference exit=$RC"; return 1; fi
  SCORE=$($CPU_ENV timeout 900 \
    python -m equidock_public_tpu.cli.eval_outputs -input_dir "$OUT" \
    -ground_truth_dir $DIPS_TEST/complexes \
    -method EQUIDOCK_TPU 2>>"$Q/$NAME.log" | grep num_files)
  if [ -z "$SCORE" ]; then log "$NAME: dips score FAILED (empty)"; return 1; fi
  log "$NAME DIPS score $SCORE"
  echo "{\"name\": \"${NAME}_dipstest\", \"stage\": \"r4q3\", \"round\": 4, ${SCORE#\{}" >> results/trial_table.jsonl
}

best_ckpt() {  # newest best checkpoint across attempts for trial $1 ($2=db5|dips)
  ls -dt ./checkpts_r4/$1*/*/${2}_model_best 2>/dev/null | head -1
}

# _train NAME MAXS [flags...] — probe-gated, checkpoint-preserving retries
_train() {
  NAME=$1; MAXS=$2; shift 2
  TRIALS=$((TRIALS+1))
  for attempt in 1 2 3; do
    probe_tpu || { FAILURES=$((FAILURES+1)); return 1; }
    if [ -d "./checkpts_r4/$NAME" ]; then
      mv "./checkpts_r4/$NAME" "./checkpts_r4/${NAME}_try$attempt.$$"
    fi
    timeout $((MAXS + 900)) python -m equidock_public_tpu.cli.train -toy -data db5 \
      "$@" \
      -device_resident -val_repeats 6 -select_metric bar \
      -max_seconds "$MAXS" \
      -cache_dir ./cache -checkpoint_dir "./checkpts_r4/$NAME" \
      -compile_cache ./jax_cache > "$Q/$NAME.log" 2>&1
    RC=$?
    log "$NAME train exit=$RC (attempt $attempt)"
    [ "$RC" -eq 0 ] && break
  done
  CKPT=$(best_ckpt "$NAME" db5)
  if [ -z "$CKPT" ]; then
    log "$NAME: no checkpoint from any attempt"; FAILURES=$((FAILURES+1)); return 1
  fi
  score_db5 "$NAME" "$CKPT" || FAILURES=$((FAILURES+1))
}

log "stage3 start"

log "A: r4_ftl3_s50 — frozen copy-init refinement on small_l3 (resident rerun)"
_train r4_ftl3_s50 2400 \
  -fine_tune_from artifacts/db5_model_small_l3 -freeze_original -fine_tune_init copy \
  -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 \
  -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 -random_seed 50

SMALL="-iegmn_lay_hid_dim 16 -residue_emb_dim 16 -iegmn_n_lays 3 -shared_layers -num_att_heads 8"
HYP="-lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024"

log "B: r4_bigval_s52 — s16l3 on cv_bigval (55-complex val, resident)"
_train r4_bigval_s52 2700 \
  $SMALL $HYP -random_seed 52 -split 4 -split_files_path data_splits/cv_bigval

# ---- CROP corpus-size study ------------------------------------------------
CROP_CACHE=./cache/dips_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_0
if [ -f "$CROP_CACHE/train_shard0000.npz" ]; then
  TRIALS=$((TRIALS+1))
  log "CROP: pretrain small on the 16K interface-crop corpus (resident)"
  probe_tpu && timeout 6300 python -m equidock_public_tpu.cli.train \
    -data dips $SMALL \
    -lr 2e-4 -w_decay 1e-4 -patience 40 -bs 8 \
    -node_buckets 128,192,256,512 -pocket_buckets 256,512,1024 \
    -random_seed 60 -device_resident -val_repeats 1 \
    -max_seconds 5400 \
    -cache_dir ./cache -checkpoint_dir ./checkpts_r4/r4_crop_pre \
    -compile_cache ./jax_cache > $Q/r4_crop_pre.log 2>&1
  RC=$?
  log "crop pretrain exit=$RC"
  PRE=$(best_ckpt r4_crop_pre dips)
  if [ -n "$PRE" ]; then
    score_dips crop_pre_zeroshot "$PRE"
    log "CROP: fine-tune on DB5 from the crop-pretrained trunk"
    probe_tpu && timeout 3300 python -m equidock_public_tpu.cli.train -toy -data db5 \
      -continue_train_model "$PRE" \
      $HYP -random_seed 61 -device_resident -val_repeats 6 -select_metric bar \
      -max_seconds 2400 \
      -cache_dir ./cache -checkpoint_dir ./checkpts_r4/r4_crop_ft \
      -compile_cache ./jax_cache > $Q/r4_crop_ft.log 2>&1
    RC=$?
    log "crop finetune exit=$RC"
    FT=$(best_ckpt r4_crop_ft db5)
    if [ -n "$FT" ]; then
      score_db5 r4_crop_ft "$FT"
      score_dips crop_ft_zeroshot "$FT"
    else
      log "crop finetune: no checkpoint"; FAILURES=$((FAILURES+1))
    fi
  else
    log "crop pretrain: no checkpoint"; FAILURES=$((FAILURES+1))
  fi
else
  log "CROP: cache missing ($CROP_CACHE) — skipped"
fi

log "A2: r4_ftl3_s51"
_train r4_ftl3_s51 2400 \
  -fine_tune_from artifacts/db5_model_small_l3 -freeze_original -fine_tune_init copy \
  -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 \
  -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 -random_seed 51

log "C: r4_barsel_s40 — rerun of the lost stage-8 trial (resident)"
_train r4_barsel_s40 2700 $SMALL $HYP -random_seed 40

# ---- bench block (also warms the driver's jax_cache) ------------------------
log "BENCH: edge_sol ceilings"
probe_tpu && timeout 3000 env BENCH_MODE=edge_sol python bench_kernels.py \
  > $Q/edge_sol_tpu.json 2> $Q/edge_sol_tpu.err
log "edge_sol exit=$? $(tail -c 200 $Q/edge_sol_tpu.json | tr -d '\n' | tail -c 120)"

log "BENCH: resident real-epoch line"
probe_tpu && timeout 3000 env BENCH_MODE=resident_epoch python bench.py \
  > $Q/resident_epoch_bench.json 2> $Q/resident_epoch.err
log "resident_epoch exit=$? $(cat $Q/resident_epoch_bench.json 2>/dev/null | tr -d '\n')"

log "BENCH: packed XLA vs packed fused-attention (N=1024 synthetic epoch)"
probe_tpu && timeout 3000 env BENCH_MODE=dips_epoch BENCH_PACK=4 BENCH_PAIRS=120 \
  BENCH_BUCKETS=512,1024,2048,3072 python bench.py \
  > $Q/packed_xla_bench.json 2> $Q/packed_xla.err
log "packed_xla exit=$? $(cat $Q/packed_xla_bench.json 2>/dev/null | tr -d '\n')"
probe_tpu && timeout 3000 env BENCH_MODE=dips_epoch BENCH_PACK=4 BENCH_PAIRS=120 \
  BENCH_BUCKETS=512,1024,2048,3072 BENCH_FUSED_ATTN=1 python bench.py \
  > $Q/packed_fused_bench.json 2> $Q/packed_fused.err
log "packed_fused exit=$? $(cat $Q/packed_fused_bench.json 2>/dev/null | tr -d '\n')"

log "BENCH: warm default driver bench"
probe_tpu && timeout 3600 python bench.py > $Q/default_bench.json 2> $Q/default_bench.err
log "default bench exit=$? $(cat $Q/default_bench.json 2>/dev/null | tr -d '\n')"

log "D: r4_otw2_s54 — pocket-OT weight 2"
_train r4_otw2_s54 2700 $SMALL $HYP -random_seed 54 -pocket_ot_loss_weight 2.0

log "B2: r4_bigval_s53"
_train r4_bigval_s53 2700 \
  $SMALL $HYP -random_seed 53 -split 4 -split_files_path data_splits/cv_bigval

log "stage3 done: $FAILURES failures / $TRIALS trials"
[ "$FAILURES" -lt "$TRIALS" ] || exit 1
