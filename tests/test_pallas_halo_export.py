"""TPU lowering of the overlapped RDMA halo kernels (no TPU needed).

`jax.export(platforms=["tpu"])` runs the full StableHLO lowering including
Pallas-Mosaic kernel serialization, so this validates the kernels are
TPU-lowerable (shape/DMA legality) without multi-chip hardware; the LLO
compile + timing remain deferred to a real slice (PERF.md round-3 halo
section)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from equidock_public_tpu.parallel.pallas_halo import ring_exchange, ring_ship

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")

GP = 4
B, S, H, F = 2, 64, 16, 67


def _mesh():
    return Mesh(np.array(jax.devices()[:GP]).reshape(1, GP),
                ("data", "graph"))


def _export(f, args):
    exported = jax.export.export(jax.jit(f), platforms=["tpu"])(*args)
    assert "tpu_custom_call" in exported.mlir_module()
    return exported


def test_ring_exchange_lowers_for_tpu():
    def local_fn(xh_l, sn, sp):
        def take(idx):
            return jnp.take_along_axis(xh_l, idx[..., None], axis=1)

        return ring_exchange(xh_l, take(sn[:, 0]), take(sp[:, 0]),
                             "graph", GP, False)

    f = jax.shard_map(
        local_fn, mesh=_mesh(),
        in_specs=(P(None, "graph", None),) * 3,
        out_specs=P(None, "graph", None), check_vma=False)
    _export(f, (jax.ShapeDtypeStruct((B, GP * S, F), jnp.float32),
                jax.ShapeDtypeStruct((B, GP, H), jnp.int32),
                jax.ShapeDtypeStruct((B, GP, H), jnp.int32)))


def test_ring_exchange_grad_lowers_for_tpu():
    """The custom VJP's reverse shipment kernel must lower too."""
    sn = jnp.zeros((B, GP, H), jnp.int32)
    sp = jnp.zeros((B, GP, H), jnp.int32)

    def local_fn(xh_l, sn_l, sp_l):
        def take(idx):
            return jnp.take_along_axis(xh_l, idx[..., None], axis=1)

        out = ring_exchange(xh_l, take(sn_l[:, 0]), take(sp_l[:, 0]),
                            "graph", GP, False)
        return jnp.sum(out * out)

    def loss(xh):
        y = jax.shard_map(
            local_fn, mesh=_mesh(),
            in_specs=(P(None, "graph", None),) * 3,
            out_specs=P(), check_vma=False)(xh, sn, sp)
        return y

    _export(jax.grad(loss),
            (jax.ShapeDtypeStruct((B, GP * S, F), jnp.float32),))


def test_ring_ship_lowers_for_tpu():
    def local_fn(a, b):
        return ring_ship(a[0], b[0], "graph", GP, False)

    f = jax.shard_map(
        local_fn, mesh=_mesh(),
        in_specs=(P("graph", None, None),) * 2,
        out_specs=(P(None, None),) * 2, check_vma=False)
    _export(f, (jax.ShapeDtypeStruct((GP, 128, F), jnp.float32),
                jax.ShapeDtypeStruct((GP, 96, F), jnp.float32)))
