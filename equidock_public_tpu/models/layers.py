"""Functional NN primitives with explicit parameter PyTrees.

Initialization matches PyTorch defaults (the reference never calls its
`reset_parameters`, `rigid_docking_model.py:175`, so it trains with torch's
default inits): Linear weight/bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
Embedding ~ N(0, 1), LayerNorm gamma=1 beta=0 (eps 1e-5).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def init_linear(rng, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(in_dim)
    p = {"w": jax.random.uniform(k1, (in_dim, out_dim), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (out_dim,), jnp.float32, -bound, bound)
    return p


def linear(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Affine map. With compute_dtype='bfloat16' both operands are cast to
    bf16 for the MXU (2x FLOPs on TPU) while accumulating in f32; params stay
    f32 (mixed-precision pattern). Output is returned in f32."""
    w = p["w"]
    xin = x
    if compute_dtype is not None and compute_dtype != "float32":
        dt = jnp.dtype(compute_dtype)
        xin = x.astype(dt)
        w = w.astype(dt)
    y = jnp.einsum("...i,io->...o", xin, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(jnp.float32)


def init_layer_norm(dim: int) -> Params:
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def init_embedding(rng, num: int, dim: int) -> Params:
    return {"e": jax.random.normal(rng, (num, dim), jnp.float32)}


def embedding(p: Params, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["e"], idx, axis=0)


def nonlin(x: jnp.ndarray, kind: str, neg_slope: float) -> jnp.ndarray:
    if kind == "swish":
        return jax.nn.silu(x)
    assert kind == "lkyrelu"
    return jax.nn.leaky_relu(x, negative_slope=neg_slope)


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
            train: bool) -> jnp.ndarray:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def graph_norm(p: Params, x: jnp.ndarray, node_mask: jnp.ndarray,
               eps: float = 1e-5, axis: Optional[str] = None) -> jnp.ndarray:
    """Per-graph feature normalization over the node axis (GraphNorm,
    `src/utils/graph_norm.py:26-41`): normalize each feature by the mean/std
    over that complex's valid nodes. x (B, N, D), node_mask (B, N).

    Matches the reference's (x - mean) / (std + eps) with std the sample
    standard deviation (ddof=1). When the node axis is sharded over a mesh
    axis (`axis`, halo path), the statistics psum over it so they cover the
    whole complex."""
    w = node_mask[..., None]

    def _sum(v):
        s = jnp.sum(v, axis=1, keepdims=True)
        return jax.lax.psum(s, axis) if axis is not None else s

    n = jnp.maximum(_sum(w), 1.0)
    mean = _sum(x * w) / n
    var = _sum(((x - mean) ** 2) * w) / jnp.maximum(n - 1.0, 1.0)
    out = (x - mean) / (jnp.sqrt(var) + eps)
    return out * p["g"] + p["b"]
