#!/bin/bash
# Round-3 TPU stage 6 (contingency): the round-2 stage-14 shape that scored
# 14.01/12.48 under CRMSD selection (Hdim-16 3-layer shared), retried under
# 'bar' selection (max(crmsd-14.2, irmsd-12.1)) which cannot trade one
# metric away. Two seeds; runs only if wall clock allows after stage 5.
set -u
cd /root/repo
Q=results/round3_queue
log() { echo "[r3q6] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }

while ! grep -q "stage5 done" $Q/queue.log; do sleep 60; done
log "stage6: TPU free, corrected packed benches then bar-selection trials"

# Corrected packed-vs-unpacked epoch A/B: warm 4 shuffled epochs (shape-set
# closure) then time 2 (BENCH_WARM_EPOCHS/BENCH_TIMED_EPOCHS; the stage-3
# run timed compile noise on fresh shapes, not throughput).
FINE=64,128,192,256,320,384,448,512,640,768,1024,1536,2048,3072
COARSE=512,1024,2048,3072
runb() {
  NAME=$1; shift
  OUT=$(env "$@" BENCH_WARM_EPOCHS=4 BENCH_TIMED_EPOCHS=2 timeout 3000 python bench.py 2>/dev/null | tail -1)
  log "benchv2 $NAME $OUT"
  echo "$OUT" >> $Q/stage6_bench.jsonl
}
runb db5_unpacked_coarse BENCH_MODE=db5_epoch BENCH_BUCKETS=$COARSE
runb db5_packed_c10      BENCH_MODE=db5_epoch BENCH_BUCKETS=$FINE BENCH_PACK=10
runb db5_packed_c10_coarse BENCH_MODE=db5_epoch BENCH_BUCKETS=$COARSE BENCH_PACK=10
runb dips_unpacked       BENCH_MODE=dips_epoch BENCH_BUCKETS=$FINE
runb dips_packed_c10     BENCH_MODE=dips_epoch BENCH_BUCKETS=$FINE BENCH_PACK=10
log "stage6 benches done"

run_trial() {
  NAME=$1; SEED=$2; MAXS=$3; shift 3
  log "$NAME: hid=16 emb=16 lays=3 shared seed=$SEED select=bar $*"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 600)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -iegmn_lay_hid_dim 16 -residue_emb_dim 16 -iegmn_n_lays 3 -shared_layers \
    -num_att_heads 8 \
    "$@" \
    -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 \
    -val_repeats 6 -select_metric bar \
    -random_seed "$SEED" -max_seconds "$MAXS" \
    -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
    -cache_dir ./cache -checkpoint_dir "./checkpts_small/$NAME" \
    -compile_cache ./jax_cache > "$Q/$NAME.log" 2>&1
  RC=$?
  log "$NAME train exit=$RC"
  if [ "$RC" -ne 0 ]; then log "$NAME: ABORTED (train failed)"; return 1; fi
  CKPT=$(ls -dt ./checkpts_small/$NAME/*/db5_model_best 2>/dev/null | head -1)
  if [ -z "$CKPT" ]; then log "$NAME: no checkpoint"; return 1; fi
  OUT="results/db5_$NAME"
  rm -rf "$OUT"; mkdir -p "$OUT"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 1800 \
    python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
    -input_dir /root/reference/test_sets_pdb/db5_test_random_transformed/random_transformed \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> "$Q/$NAME.log" 2>&1
  SCORE=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 600 \
    python -m equidock_public_tpu.cli.eval_outputs -input_dir "$OUT" \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -method EQUIDOCK_TPU 2>/dev/null | grep num_files)
  log "$NAME score $SCORE"
}

# copy-init frozen refinement on the small trunk: starts AT stage-1 quality
run_ft_copy() {
  NAME=$1; SEED=$2; MAXS=$3
  log "$NAME: fine_tune_from=small_s2 copy-init frozen seed=$SEED"
  rm -rf "./checkpts_small/$NAME"
  timeout $((MAXS + 600)) python -m equidock_public_tpu.cli.train -toy -data db5 \
    -fine_tune_from artifacts/db5_model_small_s2 -freeze_original \
    -fine_tune_init copy \
    -lr 1e-4 -w_decay 1e-4 -patience 400 -bs 4 \
    -val_repeats 6 -select_metric bar \
    -random_seed "$SEED" -max_seconds "$MAXS" \
    -node_buckets 512,1024,2048,3072 -pocket_buckets 256,512,1024 \
    -cache_dir ./cache -checkpoint_dir "./checkpts_small/$NAME" \
    -compile_cache ./jax_cache > "$Q/$NAME.log" 2>&1
  RC=$?
  log "$NAME train exit=$RC"
  if [ "$RC" -ne 0 ]; then log "$NAME: ABORTED (train failed)"; return 1; fi
  CKPT=$(ls -dt ./checkpts_small/$NAME/*/db5_model_best 2>/dev/null | head -1)
  if [ -z "$CKPT" ]; then log "$NAME: no checkpoint"; return 1; fi
  OUT="results/db5_$NAME"
  rm -rf "$OUT"; mkdir -p "$OUT"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 1800 \
    python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
    -input_dir /root/reference/test_sets_pdb/db5_test_random_transformed/random_transformed \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> "$Q/$NAME.log" 2>&1
  SCORE=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 600 \
    python -m equidock_public_tpu.cli.eval_outputs -input_dir "$OUT" \
    -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
    -method EQUIDOCK_TPU 2>/dev/null | grep num_files)
  log "$NAME score $SCORE"
}
run_ft_copy r3_ftcopy_frozen_s40 40 2400
run_trial r3_barsel_s16l3_s40 40 2700
run_ft_copy r3_ftcopy_frozen_s41 41 2400
run_trial r3_barsel_s16l3_s42 42 2700
log "stage6 done"
