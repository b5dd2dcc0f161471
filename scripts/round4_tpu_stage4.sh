#!/bin/bash
# Round-4 TPU stage 4: reprioritized remainder of stage 3.
#
# Why: the bootstrap analysis (results/ens_weight_search8.json) shows the
# 25-complex cv_0 val cannot certify the dual-parity bar (max P(both bars)
# = 0.43), and the r3 evidence says the pareto front CROSSES the bar region.
# So the highest-value TPU work is growing a member pool TRAINED ON
# cv_bigval (173 train / 55 val) whose clean selection set is 55 complexes:
# ensemble weights get selected on bigval-val (never test), then ONE frozen
# test shot. Crop corpus study and the bench block follow.
set -u
cd /root/repo
Q=results/round4_queue
mkdir -p $Q
exec 9>$Q/stage4.lock
flock -n 9 || { echo "another stage4 instance is running"; exit 1; }
log() { echo "[r4q4] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }
FAILURES=0
TRIALS=0

CPU_ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
DB5_TEST=/root/reference/test_sets_pdb/db5_test_random_transformed
DIPS_TEST=/root/reference/test_sets_pdb/dips_test_random_transformed

# wait for the orphaned trial-B trainer (stage-3 leftover) to finish
while ps -ef | grep -v grep | grep "cli.train" | grep -q "r4_bigval_s52"; do
  sleep 30
done
log "stage4 start (trial B trainer drained)"

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
  echo "{\"name\": \"$NAME\", \"stage\": \"r4q4\", \"round\": 4, ${SCORE#\{}" >> results/trial_table.jsonl
}

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
  echo "{\"name\": \"${NAME}_dipstest\", \"stage\": \"r4q4\", \"round\": 4, ${SCORE#\{}" >> results/trial_table.jsonl
}

best_ckpt() {
  ls -dt ./checkpts_r4/$1*/*/${2}_model_best 2>/dev/null | head -1
}

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

# score the orphaned trial B if stage 3 didn't get to it
if ! grep -q '"name": "r4_bigval_s52"' results/trial_table.jsonl; then
  CKPT=$(best_ckpt r4_bigval_s52 db5)
  [ -n "$CKPT" ] && score_db5 r4_bigval_s52 "$CKPT" || log "trial B: no checkpoint yet"
fi

BIGVAL="-split 4 -split_files_path data_splits/cv_bigval"
HYP="-lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024"
L3="-iegmn_lay_hid_dim 16 -residue_emb_dim 16 -iegmn_n_lays 3 -shared_layers -num_att_heads 8"
L2="-iegmn_lay_hid_dim 16 -residue_emb_dim 16 -iegmn_n_lays 2 -num_att_heads 8"
BIG="-iegmn_lay_hid_dim 64 -residue_emb_dim 64 -iegmn_n_lays 5 -shared_layers -num_att_heads 50"

log "M1: r4_bigval_s53 — l3 member, seed 53"
_train r4_bigval_s53 2700 $L3 $HYP -random_seed 53 $BIGVAL

log "M2: r4_bigval_l2_s55 — 2-layer member (the IRMSD puller shape)"
_train r4_bigval_l2_s55 2700 $L2 $HYP -random_seed 55 $BIGVAL

# ---- bench block -------------------------------------------------------------
log "BENCH: edge_sol ceilings"
probe_tpu && timeout 3000 env BENCH_MODE=edge_sol python bench_kernels.py \
  > $Q/edge_sol_tpu.json 2> $Q/edge_sol_tpu.err
log "edge_sol exit=$?"

log "BENCH: resident real-epoch line"
probe_tpu && timeout 3000 env BENCH_MODE=resident_epoch python bench.py \
  > $Q/resident_epoch_bench.json 2> $Q/resident_epoch.err
log "resident_epoch exit=$? $(cat $Q/resident_epoch_bench.json 2>/dev/null | tr -d '\n')"

log "BENCH: packed XLA vs packed fused-attention"
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

log "M3: r4_bigval_big_s56 — 64-dim member (the CRMSD puller shape)"
_train r4_bigval_big_s56 2700 $BIG $HYP -random_seed 56 $BIGVAL

# ---- CROP corpus-size study --------------------------------------------------
SMALL="$L3"
CROP_CACHE=./cache/dips_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_0
if [ -f "$CROP_CACHE/train_shard0000.npz" ]; then
  TRIALS=$((TRIALS+1))
  log "CROP: pretrain small on the 16K interface-crop corpus (resident)"
  probe_tpu && timeout 3900 python -m equidock_public_tpu.cli.train \
    -data dips $SMALL \
    -lr 2e-4 -w_decay 1e-4 -patience 40 -bs 8 \
    -node_buckets 128,192,256,512 -pocket_buckets 256,512,1024 \
    -random_seed 60 -device_resident -val_repeats 1 \
    -max_seconds 3000 \
    -cache_dir ./cache -checkpoint_dir ./checkpts_r4/r4_crop_pre \
    -compile_cache ./jax_cache > $Q/r4_crop_pre.log 2>&1
  RC=$?
  log "crop pretrain exit=$RC"
  PRE=$(best_ckpt r4_crop_pre dips)
  if [ -n "$PRE" ]; then
    log "CROP: fine-tune on DB5 from the crop-pretrained trunk"
    probe_tpu && timeout 2700 python -m equidock_public_tpu.cli.train -toy -data db5 \
      -continue_train_model "$PRE" \
      $HYP -random_seed 61 -device_resident -val_repeats 6 -select_metric bar \
      -max_seconds 1800 \
      -cache_dir ./cache -checkpoint_dir ./checkpts_r4/r4_crop_ft \
      -compile_cache ./jax_cache > $Q/r4_crop_ft.log 2>&1
    RC=$?
    log "crop finetune exit=$RC"
    score_dips crop_pre_zeroshot "$PRE" &
    PREPID=$!
    FT=$(best_ckpt r4_crop_ft db5)
    if [ -n "$FT" ]; then
      score_db5 r4_crop_ft "$FT"
      score_dips crop_ft_zeroshot "$FT"
    else
      log "crop finetune: no checkpoint"; FAILURES=$((FAILURES+1))
    fi
    wait $PREPID
  else
    log "crop pretrain: no checkpoint"; FAILURES=$((FAILURES+1))
  fi
else
  log "CROP: cache missing — skipped"
fi

log "stage4 done: $FAILURES failures / $TRIALS trials"
[ "$FAILURES" -lt "$TRIALS" ] || exit 1
