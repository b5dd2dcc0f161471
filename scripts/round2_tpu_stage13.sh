#!/bin/bash
# Round-2 TPU stage 13: extend the small-model IRMSD replication — two more
# seeds of the winning Hdim-16 2-layer shape (test IRMSD 12.16 / 11.94 at
# seeds 30/31, reference 11.97) plus a 3-layer shared variant. Scores land
# in queue.log; checkpoints under checkpts_small/ for later commit.
cd /root/repo
Q=results/round2_queue
log() { echo "[stage13] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage12 done" $Q/queue.log; do sleep 120; done
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
    -compile_cache ./jax_cache > "$Q/stage13_$NAME.log" 2>&1
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
    >> "$Q/stage13_$NAME.log" 2>&1
  SCORE=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 600 \
    python -m equidock_public_tpu.cli.eval_outputs -input_dir "$OUT" \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -method EQUIDOCK_TPU 2>/dev/null | grep num_files)
  log "$NAME score $SCORE"
}

run_trial s16c 33 16 16 2
run_trial s16d 34 16 16 2
run_trial s16l3 35 16 16 3 -shared_layers

log "final default bench warm"
timeout 3600 python bench.py > $Q/stage13_bench.json 2>> $Q/bench.err
log "exit=$? $(cat $Q/stage13_bench.json)"
log "stage13 done"
