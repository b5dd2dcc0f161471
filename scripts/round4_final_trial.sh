#!/bin/bash
# Round-4 final long-shot: continue the committed 64-dim CRMSD champion
# (artifacts/db5_model_best, single-checkpoint 14.29/11.94-family) under
# device-resident epochs with bar-metric selection and a long budget —
# 64-dim needed more steps than any 2700s window gave it (RESULTS bigval
# table); this is the cheap test of that hypothesis on the STRONG (cv_0)
# training set. Scored + appended to the trial table on completion.
set -u
cd /root/repo
Q=results/round4_queue
exec 7>$Q/final_trial.lock
flock -n 7 || exit 1
log() { echo "[r4final] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }
CPU_ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
DB5_TEST=/root/reference/test_sets_pdb/db5_test_random_transformed

log "final long-shot: continue db5_model_best, resident, bar selection"
timeout 7500 python -m equidock_public_tpu.cli.train -toy -data db5 \
  -continue_train_model artifacts/db5_model_best \
  -lr 1e-4 -w_decay 1e-3 -patience 400 -bs 10 \
  -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
  -random_seed 70 -device_resident -val_repeats 6 -select_metric bar \
  -max_seconds 6600 \
  -cache_dir ./cache -checkpoint_dir ./checkpts_r4/r4_best_long \
  -compile_cache ./jax_cache > $Q/r4_best_long.log 2>&1
RC=$?
log "final trial train exit=$RC"
CKPT=$(ls -dt ./checkpts_r4/r4_best_long/*/db5_model_best 2>/dev/null | head -1)
[ -z "$CKPT" ] && { log "final trial: no checkpoint"; exit 1; }
OUT=results/db5_r4_best_long
rm -rf "$OUT"; mkdir -p "$OUT"
$CPU_ENV timeout 2400 python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
  -input_dir $DB5_TEST/random_transformed -ground_truth_dir $DB5_TEST/complexes \
  -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
  >> $Q/r4_best_long.log 2>&1
SCORE=$($CPU_ENV timeout 600 python -m equidock_public_tpu.cli.eval_outputs \
  -input_dir "$OUT" -ground_truth_dir $DB5_TEST/complexes \
  -method EQUIDOCK_TPU 2>>$Q/r4_best_long.log | grep num_files)
log "r4_best_long score $SCORE"
[ -n "$SCORE" ] && echo "{\"name\": \"r4_best_long\", \"stage\": \"r4final\", \"round\": 4, ${SCORE#\{}" >> results/trial_table.jsonl
git add results/trial_table.jsonl $Q/queue.log $Q/r4_best_long.log "$OUT" checkpts_r4/r4_best_long 2>/dev/null
git commit -q -m "Final long-shot trial: extended 64-dim champion (resident, bar selection)" || true
