"""Optimizer parity: the optax chain must reproduce torch.optim.Adam with
L2 weight_decay + grad clipping (the reference setup, `train.py:156,302`)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from equidock_public_tpu.config import TrainConfig
from equidock_public_tpu.train.optim import make_optimizer


def test_adam_with_weight_decay_matches_torch():
    lr, wd, clip = 1e-2, 1e-3, 0.5
    w0 = np.random.default_rng(0).standard_normal(6).astype(np.float64)

    # torch reference
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    torch_traj = []
    for step in range(10):
        opt.zero_grad()
        loss = torch.sum(torch.sin(wt * (step + 1)) ** 2)
        loss.backward()
        torch.nn.utils.clip_grad_norm_([wt], max_norm=clip)
        opt.step()
        torch_traj.append(wt.detach().numpy().copy())

    # ours (note: torch clips BEFORE adding wd*p; our chain clips first too)
    tc = TrainConfig(lr=lr, w_decay=wd, clip=clip, warmup=1.0)
    optx = make_optimizer(tc)
    params = jnp.asarray(w0)
    state = optx.init(params)
    ours_traj = []
    for step in range(10):
        g = jax.grad(lambda w: jnp.sum(jnp.sin(w * (step + 1)) ** 2))(params)
        updates, state = optx.update(g, state, params)
        params = params + updates
        ours_traj.append(np.asarray(params))

    # torch's Adam adds wd*p AFTER clipping, same order as our chain; the
    # only semantic difference is torch's +1e-6 in the clip denominator and
    # f32-vs-f64 accumulation, so tolerances are loose but tight enough to
    # catch any ordering/decoupling mistake (AdamW-style decoupled decay
    # diverges at 1e-2 by step 10 on this problem).
    for i, (a, b) in enumerate(zip(torch_traj, ours_traj)):
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-5,
                                   err_msg=f"step {i}")


def test_warmup_schedule_matches_reference_lambda():
    """lr * min(1, ((step+1)/warmup)^3) (`train_utils.py:134-136`)."""
    from equidock_public_tpu.train.optim import warmup_schedule

    sched = warmup_schedule(2e-4, warmup=10.0)
    for step in [0, 3, 9, 10, 50]:
        expect = 2e-4 * min(1.0, ((step + 1) / 10.0) ** 3)
        np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-6)


def test_cyclic_epoch_factor_matches_torch_cyclic_lr():
    """Triangular epoch factor == torch CyclicLR(base, 10*base,
    step_size_up=warmup) stepped per epoch (`train_utils.py:131-134`,
    `train.py:369`)."""
    from equidock_public_tpu.train.optim import cyclic_epoch_factor

    base = 2e-4
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=base)
    sch = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=base, max_lr=10 * base, step_size_up=5,
        cycle_momentum=False)
    for epoch in range(25):
        torch_lr = opt.param_groups[0]["lr"]
        ours = base * cyclic_epoch_factor(epoch, 5)
        np.testing.assert_allclose(ours, torch_lr, rtol=1e-6)
        opt.step()
        sch.step()


def test_reduce_on_plateau_matches_torch_rop():
    """Host-side ReduceOnPlateau == torch ReduceLROnPlateau(mode=min,
    factor=0.5, patience=3, rel threshold) on the same val-loss trace."""
    from equidock_public_tpu.train.optim import ReduceOnPlateau

    base = 1e-3
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=base)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=3, threshold_mode="rel",
        cooldown=0, min_lr=0.0)
    ours = ReduceOnPlateau(factor=0.5, patience=3)

    rng = np.random.default_rng(0)
    # plateaus then improvements then a long plateau (two reductions)
    trace = [5.0, 4.0, 4.1, 4.05, 4.2, 4.0, 3.0] + [3.1] * 10
    for v in trace:
        sch.step(v)
        scale = ours.step(v)
        np.testing.assert_allclose(base * scale, opt.param_groups[0]["lr"],
                                   rtol=1e-9, err_msg=f"val={v}")


def test_lr_scale_scales_update():
    """train_step's lr_scale multiplies the applied update exactly."""
    from tests.utils import synth_batch, tiny_config
    from equidock_public_tpu.models.iegmn import init_docking_model
    from equidock_public_tpu.train.step import create_train_state, train_step

    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(np.random.default_rng(0))
    key = jax.random.PRNGKey(1)

    # train_step donates its state, so give each state its own param copy
    # and keep `params` itself out of the donated trees
    s_full = create_train_state(jax.tree.map(jnp.copy, params), cfg)
    s_zero = create_train_state(jax.tree.map(jnp.copy, params), cfg)
    s_full, _ = train_step(s_full, batch, key, cfg, jnp.float32(1.0))
    s_zero, _ = train_step(s_zero, batch, key, cfg, jnp.float32(0.0))
    # scale 0 -> pure no-op on params
    for a, b in zip(jax.tree.leaves(s_zero.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # scale 1 -> params actually moved
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(s_full.params),
                                jax.tree.leaves(params)))
    assert moved
