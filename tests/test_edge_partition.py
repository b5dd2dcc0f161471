"""Ring cross-attention == dense masked attention on the CPU mesh.

(The round-1 full-all_gather sharded-layer demo that used to live here was
replaced by the boundary-exchange path; see parallel/halo.py and
tests/test_halo.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equidock_public_tpu.parallel.mesh import make_mesh

from .utils import synth_batch, tiny_config  # noqa: F401  (shared fixtures)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_ring_cross_attention_matches_dense(rng):
    from equidock_public_tpu.ops.attention import cross_attention
    from equidock_public_tpu.parallel.ring_attention import (
        make_ring_cross_attention)

    B, N, M, D = 4, 16, 24, 8
    q = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    qm = np.zeros((B, N), np.float32); qm[:, :13] = 1
    km = np.zeros((B, M), np.float32); km[:, :19] = 1
    qm, km = jnp.asarray(qm), jnp.asarray(km)

    ref = cross_attention(q, k, v, qm, km)

    mesh = make_mesh(dp=4, gp=2)
    ring = make_ring_cross_attention(mesh)
    with jax.set_mesh(mesh):
        got = ring(q, k, v, qm, km)

    w = np.asarray(qm)[..., None]
    np.testing.assert_allclose(np.asarray(got) * w, np.asarray(ref) * w,
                               rtol=1e-4, atol=1e-5)


def test_ring_attention_small_value_dim(rng):
    """The fine-tune coordinate attention runs the ring with 3-dim values."""
    from equidock_public_tpu.ops.attention import cross_attention
    from equidock_public_tpu.parallel.ring_attention import (
        make_ring_cross_attention)

    B, N, M, D = 4, 16, 16, 8
    q = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, M, 3)).astype(np.float32))
    qm = jnp.ones((B, N), jnp.float32)
    km = jnp.ones((B, M), jnp.float32)

    ref = cross_attention(q, k, v, qm, km)
    mesh = make_mesh(dp=4, gp=2)
    ring = make_ring_cross_attention(mesh)
    with jax.set_mesh(mesh):
        got = ring(q, k, v, qm, km)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
