"""Per-field Adam with external learning rates — the reference trains every
model with ``torch.optim.Adam(param_groups, lr=0.0, eps=1e-15)`` and
per-group lrs updated by schedules (gm_background.training_setup:155-180,
gm_dynamics.training_setup_current:372-398).

Here the optimizer is a pure pytree transform: ``adam_init`` builds (mu, nu,
count) for a dict of trainable arrays; ``adam_step`` applies one update with a
dict of per-field lrs passed in (so schedules stay host-side, like the
reference's update_learning_rate). Moments are exposed for the densification
"optimizer surgery" (zeroing rows of new Gaussians)."""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    count: jnp.ndarray


def adam_init(params: Dict[str, jnp.ndarray]) -> AdamState:
    z = {k: jnp.zeros_like(v) for k, v in params.items()}
    return AdamState(mu=z, nu={k: jnp.zeros_like(v) for k, v in params.items()},
                     count=jnp.zeros((), jnp.int32))


def adam_step(params, grads, state: AdamState, lrs: Dict[str, jnp.ndarray],
              b1=0.9, b2=0.999, eps=1e-15):
    """One Adam update. lrs maps field name -> scalar lr (traced OK)."""
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1 - b1**c
    bc2 = 1 - b2**c
    new_mu, new_nu, new_params = {}, {}, {}
    for k in params:
        g = grads[k]
        mu = b1 * state.mu[k] + (1 - b1) * g
        nu = b2 * state.nu[k] + (1 - b2) * g * g
        mhat = mu / bc1
        nhat = nu / bc2
        new_params[k] = params[k] - lrs[k] * mhat / (jnp.sqrt(nhat) + eps)
        new_mu[k] = mu
        new_nu[k] = nu
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)
