#!/bin/bash
# Round-2 TPU training queue (VERDICT item 4): train the -fine_tune two-stage
# architecture, then run the reference-space hyper-search, all serialized on
# the single tunneled TPU chip (never two TPU processes at once).
# Usage: bash scripts/round2_tpu_queue.sh [queue_log_dir]
set -u
LOGDIR=${1:-results/round2_queue}
mkdir -p "$LOGDIR"

COMMON="-bs 10 -val_repeats 6 -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024"

echo "[queue] $(date) fine-tune stage 1 (lr 2e-4)" | tee -a "$LOGDIR/queue.log"
timeout 4200 python -m equidock_public_tpu.cli.train \
  -max_seconds 2900 -fine_tune -iegmn_n_lays 5 -shared_layers \
  -lr 2e-4 -w_decay 1e-3 -patience 400 $COMMON \
  > "$LOGDIR/ft_stage1.log" 2>&1
echo "[queue] ft stage1 exit=$?" | tee -a "$LOGDIR/queue.log"

FT_CKPT=$(ls -d checkpts/*FT_T*/db5_model_best 2>/dev/null | head -1)
if [ -n "$FT_CKPT" ]; then
  # stage 2 saves into the same banner dir; keep stage 1's best for eval
  rm -rf "$LOGDIR/ft_stage1_ckpt"
  cp -r "$(dirname "$FT_CKPT")" "$LOGDIR/ft_stage1_ckpt"
  echo "[queue] $(date) fine-tune stage 2 (lr 1e-4) from $FT_CKPT" | tee -a "$LOGDIR/queue.log"
  timeout 4200 python -m equidock_public_tpu.cli.train \
    -max_seconds 2900 -fine_tune -iegmn_n_lays 5 -shared_layers \
    -lr 1e-4 -w_decay 1e-3 -patience 400 $COMMON \
    -continue_train_model "$FT_CKPT" \
    > "$LOGDIR/ft_stage2.log" 2>&1
  echo "[queue] ft stage2 exit=$?" | tee -a "$LOGDIR/queue.log"
else
  echo "[queue] no FT checkpoint produced; skipping stage 2" | tee -a "$LOGDIR/queue.log"
fi

echo "[queue] $(date) hyper-search (5 trials)" | tee -a "$LOGDIR/queue.log"
timeout 14400 python -m equidock_public_tpu.cli.hyper_search \
  -num_trials 5 -max_seconds 2100 -patience 150 -random_seed 17 $COMMON \
  > "$LOGDIR/hyper_search.log" 2>&1
echo "[queue] hyper-search exit=$?" | tee -a "$LOGDIR/queue.log"
echo "[queue] $(date) TPU queue done" | tee -a "$LOGDIR/queue.log"
