#!/bin/bash
# Waits for stage-9c (second-seed DB5 fine-tune from the seed-21 real-DIPS
# pretrain) to finish, then scores the best checkpoint on the frozen DB5.5
# test set on CPU. Variance companion to scripts/eval_stage6.sh.
cd /root/repo
Q=results/round2_queue
while ! grep -q "9c exit=" $Q/queue.log; do sleep 120; done
sleep 15
CKPT=$(ls -d checkpts_rdips_db5_s2/*/db5_model_best 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then echo "no stage-9 checkpoint" > $Q/stage9_eval.log; exit 1; fi
{
  echo "checkpoint: $CKPT"
  OUT=results/db5_equidock_tpu_curriculum_s2
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
  echo "eval exit=$?"
} > $Q/stage9_eval.log 2>&1
