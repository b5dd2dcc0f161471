#!/bin/bash
# OT evidence part 2 (VERDICT item 7): short training A/B — identical seed,
# data subset and schedule; the ONLY difference is the pocket-OT solver
# (on-device log-Sinkhorn vs the reference's exact-EMD semantics via a
# scipy-HiGHS host callback, `-ot_solver exact`). CPU-only so it can run
# beside the TPU queue. Trajectories land in results/ot_ab/{sinkhorn,exact}.log
# and are tabulated into RESULTS.md.
set -u
cd /root/repo
mkdir -p results/ot_ab

COMMON="-toy -data db5 -data_fraction 0.3 -bs 5 -max_epochs 10 -patience 100
        -random_seed 8 -val_repeats 3 -node_buckets 512,1024,2048,3072
        -pocket_buckets 256,512,1024 -cache_dir ./cache
        -compile_cache ./jax_cache_cpu"

run() {  # $1 = solver name
  # env -u PALLAS_AXON_POOL_IPS is REQUIRED: with it set, the axon
  # sitecustomize registers the remote-TPU plugin and kernel_env pins
  # JAX_PLATFORMS=axon, so a bare JAX_PLATFORMS=cpu prefix still lands on
  # the (single-client!) TPU tunnel.
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    timeout 14400 python -m equidock_public_tpu.cli.train \
    $COMMON -ot_solver "$1" -checkpoint_dir "/tmp/ab_$1" \
    > "results/ot_ab/$1.log" 2>&1
  echo "[ot_ab] $1 exit=$?" >> results/ot_ab/status.log
}

echo "[ot_ab] start $(date)" >> results/ot_ab/status.log
run sinkhorn
run exact
echo "[ot_ab] done $(date)" >> results/ot_ab/status.log
