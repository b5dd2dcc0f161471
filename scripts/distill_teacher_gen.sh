#!/bin/bash
# Distillation data stage: the small model (IRMSD champion) predicts poses
# for the DB5 TRAIN split (self-distillation inputs; no test leakage).
set -u
cd /root/repo
D=results/distill
mkdir -p "$D"
log() { echo "[distill] $(date '+%H:%M:%S') $*" >> $D/gen.log; }

IN=$D/train_random_transformed
if [ ! -f "$IN/.done" ]; then
  rm -rf "$IN"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 2400 \
    python -m equidock_public_tpu.cli.testset_gen -dataset db5 \
    -raw_data_path /root/reference/data/benchmark5.5/structures \
    -split_file /root/reference/data/benchmark5.5/cv/cv_0/train.txt \
    -out_dir "$IN" -seed 777 >> $D/gen.log 2>&1 && touch "$IN/.done"
  log "gen exit=$?"
fi
OUT=$D/teacher_small
if [ ! -f "$OUT/.done" ]; then
  rm -rf "$OUT"; mkdir -p "$OUT"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 7200 \
    python -m equidock_public_tpu.cli.inference \
    -checkpoint artifacts/db5_model_small_s2 \
    -input_dir "$IN" -ground_truth_dir "$IN" -output_dir "$OUT" \
    -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> $D/gen.log 2>&1 && touch "$OUT/.done"
  log "teacher_small exit=$? files=$(ls $OUT/*.pdb 2>/dev/null | wc -l)"
fi
log "distill teacher stage done"

# reverse direction: the 64-dim CRMSD champion as teacher
OUT2=$D/teacher_best
if [ ! -f "$OUT2/.done" ]; then
  rm -rf "$OUT2"; mkdir -p "$OUT2"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 7200 \
    python -m equidock_public_tpu.cli.inference \
    -checkpoint artifacts/db5_model_best \
    -input_dir "$IN" -ground_truth_dir "$IN" -output_dir "$OUT2" \
    -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    >> $D/gen.log 2>&1 && touch "$OUT2/.done"
  log "teacher_best exit=$? files=$(ls $OUT2/*.pdb 2>/dev/null | wc -l)"
fi
log "distill teacher stage done (incl. reverse)"
