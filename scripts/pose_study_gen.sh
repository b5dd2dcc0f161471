#!/bin/bash
# Round-3 pose-scorer study, data stage (VERDICT item 4): 10 independent
# random-SE(3) input-pose sets for the 25 DB5 val complexes, each scored by
# both parent checkpoints. 10 x 25 = 250 (features, label) rows for the
# selector refit in scripts/pose_scorer_n250.py.
#
# Runs entirely on CPU (the TPU queue owns the chip). Sequential: ~2 min per
# (seed, model) inference on 4 cores.
set -u
cd /root/repo
PS=results/posestudy
mkdir -p "$PS"
log() { echo "[pose] $(date '+%H:%M:%S') $*" >> $PS/gen.log; }

BIG=artifacts/db5_model_best
SMALL=artifacts/db5_model_small_s2
VAL=/root/reference/data/benchmark5.5/cv/cv_0/val.txt
RAW=/root/reference/data/benchmark5.5/structures

for SEED in 100 101 102 103 104 105 106 107 108 109; do
  IN="$PS/val_seed$SEED"
  if [ ! -f "$IN/.done" ]; then
    rm -rf "$IN"
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 900 \
      python -m equidock_public_tpu.cli.testset_gen -dataset db5 \
      -raw_data_path "$RAW" -split_file "$VAL" -out_dir "$IN" -seed "$SEED" \
      >> $PS/gen.log 2>&1 && touch "$IN/.done"
    log "gen seed $SEED exit=$?"
  fi
  for M in big small; do
    CKPT=$BIG; [ "$M" = small ] && CKPT=$SMALL
    OUT="$PS/${M}_seed$SEED"
    if [ -f "$OUT/.done" ]; then continue; fi
    rm -rf "$OUT"; mkdir -p "$OUT"
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 1800 \
      python -m equidock_public_tpu.cli.inference -checkpoint "$CKPT" \
      -input_dir "$IN" -ground_truth_dir "$IN" -output_dir "$OUT" \
      -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
      >> $PS/gen.log 2>&1 && touch "$OUT/.done"
    log "$M seed $SEED exit=$?"
  done
done
log "pose-study data stage done"
