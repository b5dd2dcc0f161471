#!/bin/bash
# Evaluate the stage-6 real-DIPS->DB5 curriculum checkpoint on the frozen
# DB5.5 test set (CPU: inference + CRMSD/IRMSD scoring; DB5 test is clean —
# the DIPS pretraining structures share nothing with DB5, see data/dips.py
# leakage note).
set -e
cd /root/repo
CKPT=${1:-$(ls -d checkpts_rdips_db5/*/db5_model_best 2>/dev/null | head -1)}
if [ -z "$CKPT" ]; then echo "no stage-6 checkpoint yet"; exit 1; fi
echo "checkpoint: $CKPT"
OUT=${2:-results/db5_equidock_tpu_curriculum}
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
