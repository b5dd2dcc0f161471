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


def init_bn_state(dim: int) -> Params:
    """Running statistics of a BatchNorm1d site (torch defaults: mean 0,
    var 1)."""
    return {"mean": jnp.zeros((dim,), jnp.float32),
            "var": jnp.ones((dim,), jnp.float32)}


def batch_norm(p: Params, st: Params, x: jnp.ndarray,
               mask: Optional[jnp.ndarray], train: bool,
               momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm1d semantics (`rigid_docking_model.py:18-20`, the reference's
    'BN' option for `layer_norm` / `final_h_layer_norm`): per-feature stats
    over every (valid) row. The reference feeds exact unpadded edge/node rows;
    here `mask` (broadcastable to x[..., :1]) restricts the statistics to
    valid rows so padding never biases them.

    Matches torch's train/eval split: train normalizes by the BIASED batch
    variance and folds the UNBIASED one into the running var with momentum
    0.1; eval normalizes by the running statistics. Returns (out, new_state);
    state flows through the step as non-gradient aux (see train/step.py).
    """
    affine = lambda y: y * p["g"] + p["b"]
    if not train:
        return (affine((x - st["mean"])
                       * jax.lax.rsqrt(st["var"] + eps)), st)
    feat_axes = tuple(range(x.ndim - 1))
    if mask is None:
        mean = jnp.mean(x, axis=feat_axes)
        var = jnp.mean((x - mean) ** 2, axis=feat_axes)
        n = jnp.asarray(x.size // x.shape[-1], jnp.float32)
    else:
        w = jnp.broadcast_to(mask, x.shape[:-1] + (1,))
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(x * w, axis=feat_axes) / n
        var = jnp.sum(((x - mean) ** 2) * w, axis=feat_axes) / n
    out = affine((x - mean) * jax.lax.rsqrt(var + eps))
    unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
    new_st = {
        "mean": (1.0 - momentum) * st["mean"] + momentum * mean,
        "var": (1.0 - momentum) * st["var"] + momentum * unbiased,
    }
    new_st = jax.tree.map(jax.lax.stop_gradient, new_st)
    return out, new_st


class BNContext:
    """Threads BatchNorm running statistics through a functional forward.

    The forward mutates no state; each BN site reads its current statistics
    (chained across repeated applications — shared layers apply the same
    module, and so the same state, several times per pass, exactly like the
    reference's shared `nn.BatchNorm1d`) and records the update in
    `self.updates`, which the caller returns as an aux output of the jitted
    step and folds back into `TrainState.bn_state`."""

    def __init__(self, state: Params, train: bool):
        self.state = state
        self.train = train
        self.updates: Params = {}

    def __call__(self, name: str, p: Params, x, mask):
        cur = self.updates.get(name, self.state[name])
        out, new = batch_norm(p, cur, x, mask, self.train)
        if self.train:
            self.updates[name] = new
        return out


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
