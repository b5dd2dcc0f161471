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
