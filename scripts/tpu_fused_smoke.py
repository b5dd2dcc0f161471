"""TPU smoke test for the rewritten fused edge-message kernel.

Compiles + runs edge_message_aggregate at a small size on the real chip and
checks parity against the pure-XLA reference. Exit 0 = Mosaic lowers the new
kernel (gather outside, P/Q iota-matmul expand/reduce inside).
"""
import numpy as np
import jax
import jax.numpy as jnp

from equidock_public_tpu.ops.pallas.edge_message import (
    _reference, edge_message_aggregate)

rng = np.random.default_rng(0)
B, N, K, D, E = 2, 128, 10, 64, 27
src = jnp.asarray(rng.standard_normal((B, N, 3 + D)).astype(np.float32))
dst = jnp.asarray(rng.standard_normal((B, N, 3 + D)).astype(np.float32))
he = jnp.asarray(rng.standard_normal((B, N, K, E)).astype(np.float32))
nbr = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
msk = jnp.asarray((rng.random((B, N, K)) < 0.9).astype(np.float32))
params = {
    "Wc": jnp.asarray(rng.standard_normal((E, D)).astype(np.float32)) * 0.1,
    "Wd": jnp.asarray(rng.standard_normal((15, D)).astype(np.float32)) * 0.1,
    "ln_g": jnp.ones((D,), jnp.float32),
    "ln_b": jnp.zeros((D,), jnp.float32),
    "W2": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32)) * 0.1,
    "b2": jnp.zeros((D,), jnp.float32),
    "W1c": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32)) * 0.1,
    "b1c": jnp.zeros((D,), jnp.float32),
    "W2c": jnp.asarray(rng.standard_normal((D, 1)).astype(np.float32)) * 0.1,
    "b2c": jnp.zeros((1,), jnp.float32),
}

print("devices:", jax.devices(), flush=True)
fused = jax.jit(lambda *a: edge_message_aggregate(*a, 0.01, True, True))
a_f, x_f = jax.block_until_ready(fused(src, dst, he, nbr, msk, params))
ref = jax.jit(lambda *a: _reference(*a, 0.01, True, True))
a_r, x_r = jax.block_until_ready(ref(src, dst, he, nbr, msk, params))
da = float(jnp.max(jnp.abs(a_f - a_r)))
dx = float(jnp.max(jnp.abs(x_f - x_r)))
ra = da / float(jnp.max(jnp.abs(a_r)))
rx = dx / float(jnp.max(jnp.abs(x_r)))
print({"max_abs_aggr": da, "max_abs_xupd": dx,
       "rel_aggr": ra, "rel_xupd": rx}, flush=True)
# Both paths run their MLP matmuls at TPU default precision (bf16 passes);
# selection matmuls in the kernel are HIGHEST, so residual diff is the
# default-precision noise of the MLP matmuls themselves.
assert ra < 3e-3 and rx < 3e-3, (ra, rx)
print("FUSED KERNEL TPU SMOKE OK", flush=True)
