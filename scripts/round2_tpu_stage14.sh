#!/bin/bash
# Round-2 TPU stage 14: rerun the two stage-13 trials lost to the axon relay
# outage (see queue.log 06:44) — the 4th seed of the winning Hdim-16 2-layer
# shape and the 3-layer shared variant. Same recipe as stage 11/13 so rows
# are comparable. Scores land in queue.log; checkpoints under checkpts_small/.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage14] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

CACHE=./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_0/train.npz
if [ ! -f "$CACHE" ]; then
  echo "FATAL: train cache missing ($CACHE) — run cli.preprocess first" >&2
  exit 1
fi

run_trial() {
  NAME=$1; SEED=$2; HID=$3; EMB=$4; LAYS=$5; MAXS=$6; shift 6
  log "$NAME: hid=$HID emb=$EMB lays=$LAYS seed=$SEED max_s=$MAXS $*"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 600)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -iegmn_lay_hid_dim "$HID" -residue_emb_dim "$EMB" -iegmn_n_lays "$LAYS" \
    -num_att_heads 8 "$@" \
    -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 -val_repeats 6 \
    -random_seed "$SEED" -max_seconds "$MAXS" \
    -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
    -cache_dir ./cache -checkpoint_dir "./checkpts_small/$NAME" \
    -compile_cache ./jax_cache > "$Q/stage14_$NAME.log" 2>&1
  RC=$?
  log "$NAME train exit=$RC"
  if [ "$RC" -ne 0 ]; then log "$NAME: ABORTED (train failed)"; return 1; fi
  CKPT=$(ls -dt ./checkpts_small/$NAME/*/db5_model_best 2>/dev/null | head -1)
  if [ -z "$CKPT" ]; then log "$NAME: no checkpoint"; return; fi
  OUT="results/db5_small_$NAME"
  mkdir -p "$OUT"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 1800 \
    python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
    -input_dir /root/reference/test_sets_pdb/db5_test_random_transformed/random_transformed \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> "$Q/stage14_$NAME.log" 2>&1
  SCORE=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 600 \
    python -m equidock_public_tpu.cli.eval_outputs -input_dir "$OUT" \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -method EQUIDOCK_TPU 2>/dev/null | grep num_files)
  log "$NAME score $SCORE"
}

# Full stage-11/13 recipe (2700 s) so the rows are directly comparable.
run_trial s16d  34 16 16 2 2700
run_trial s16l3 35 16 16 3 2700 -shared_layers

log "final default bench warm"
timeout 3600 python bench.py > $Q/stage14_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/stage14_bench.json)"
log "stage14 done"
