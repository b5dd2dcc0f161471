#!/bin/bash
# Evaluate the best trained checkpoint on the frozen DB5.5 test set:
# inference (local CPU: fast compiles) + CRMSD/IRMSD scoring.
set -e
# usage: eval_trained.sh [output_dir] [checkpoint_dir]
CKPT=${2:-$(ls -d checkpts/*/db5_model_best 2>/dev/null | head -1)}
if [ -z "$CKPT" ]; then echo "no checkpoint found"; exit 1; fi
echo "checkpoint: $CKPT"
OUT=${1:-results/db5_equidock_tpu_results}
mkdir -p "$OUT"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m equidock_public_tpu.cli.inference \
  -checkpoint "$CKPT" \
  -input_dir /root/reference/test_sets_pdb/db5_test_random_transformed/random_transformed \
  -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
  -output_dir "$OUT" \
  -node_buckets 512,1024,2048,3072 -pocket_buckets 256
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m equidock_public_tpu.cli.eval_outputs \
  -input_dir "$OUT" \
  -ground_truth_dir /root/reference/test_sets_pdb/db5_test_random_transformed/complexes \
  -method equidock_tpu
