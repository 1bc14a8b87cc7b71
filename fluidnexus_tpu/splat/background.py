"""Static background 3D-Gaussian model with the densify/clone/split/prune
lifecycle — TPU redesign of the reference ``gm_background.py`` (GaussianModel,
:1-476).

Differences by design:
- static ``capacity`` + ``alive`` mask instead of torch.cat growth /
  boolean-index shrink (reference densification_postfix:349, prune_points:286);
- the reference's "optimizer surgery" (zeroing Adam moments of new rows,
  :271-347) becomes masked writes into the optax Adam state;
- raw RGB ``color`` attribute (the reference bg model uses plain color, not SH
  — gm_background.create_from_pcd:115-134, constant 0.7 init, scales -5.9,
  opacity 0.1).

All mutation steps are pure jitted functions over a ``BackgroundModel``
pytree, so the whole densify step compiles once.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.utils.maths import inv_sigmoid, normalize, quat_to_rotmat


class BackgroundModel(NamedTuple):
    xyz: jnp.ndarray        # (C,3)
    color: jnp.ndarray      # (C,3) raw RGB (no activation)
    scaling: jnp.ndarray    # (C,3) log-scale
    rotation: jnp.ndarray   # (C,4) unnormalized quaternion
    opacity: jnp.ndarray    # (C,1) pre-sigmoid
    alive: jnp.ndarray      # (C,) bool
    max_radii2d: jnp.ndarray        # (C,)
    xyz_gradient_accum: jnp.ndarray  # (C,)
    denom: jnp.ndarray               # (C,)

    @property
    def capacity(self):
        return self.xyz.shape[0]

    @property
    def num_alive(self):
        return self.alive.sum()

    # activations (ref setup_functions, gm_dynamics.py:25-39)
    @property
    def get_scaling(self):
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self):
        return normalize(self.rotation)

    @property
    def get_opacity(self):
        return jax.nn.sigmoid(self.opacity)

    def raster_params(self):
        return dict(
            means3d=self.xyz, colors=self.color, opacities=self.get_opacity,
            scales=self.get_scaling, rotations=self.get_rotation, alive=self.alive,
        )


@dataclasses.dataclass(frozen=True)
class BackgroundParams:
    """Optimization constants (ref arguments/__init__.py OptimizationParams
    background fields + gm_background defaults)."""

    capacity: int = 120_000
    percent_dense: float = 0.01
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    color_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    init_color: float = 0.7
    init_scaling: float = -5.9
    init_opacity: float = 0.1


def create_from_points(points, params: BackgroundParams) -> BackgroundModel:
    """Initialize from a point cloud (create_from_pcd, gm_background.py:115-143:
    constant color 0.7, log-scale -5.9, opacity 0.1, identity rotation)."""
    n = points.shape[0]
    cap = params.capacity
    assert n <= cap
    f = jnp.float32

    def padded(x, fill=0.0):
        out = jnp.full((cap,) + x.shape[1:], fill, f)
        return out.at[:n].set(x)

    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    return BackgroundModel(
        xyz=padded(jnp.asarray(points, f)),
        color=padded(jnp.full((n, 3), params.init_color, f)),
        scaling=padded(jnp.full((n, 3), params.init_scaling, f)),
        rotation=padded(jnp.asarray(rots)).at[n:, 0].set(1.0),
        opacity=padded(jnp.full((n, 1), float(inv_sigmoid(jnp.asarray(params.init_opacity))), f)),
        alive=jnp.zeros((cap,), bool).at[:n].set(True),
        max_radii2d=jnp.zeros((cap,), f),
        xyz_gradient_accum=jnp.zeros((cap,), f),
        denom=jnp.zeros((cap,), f),
    )


TRAINABLE = ("xyz", "color", "scaling", "rotation", "opacity")


def add_densification_stats(model: BackgroundModel, xy_grad, radii) -> BackgroundModel:
    """Accumulate screen-space mean-grad norms for visible Gaussians
    (add_densification_stats, gm_background.py:472-476 + max_radii2D update
    in train_background.py)."""
    visible = (radii > 0) & model.alive
    gnorm = jnp.linalg.norm(xy_grad, axis=-1)
    return model._replace(
        xyz_gradient_accum=jnp.where(visible, model.xyz_gradient_accum + gnorm, model.xyz_gradient_accum),
        denom=jnp.where(visible, model.denom + 1.0, model.denom),
        max_radii2d=jnp.where(visible, jnp.maximum(model.max_radii2d, radii.astype(jnp.float32)), model.max_radii2d),
    )


def _write_rows(model: BackgroundModel, rows: dict, slots, mask) -> BackgroundModel:
    """Masked scatter of per-field rows into the given slots."""
    upd = {}
    for k, v in rows.items():
        field = getattr(model, k)
        cur = field[slots]
        sel = mask.reshape((-1,) + (1,) * (v.ndim - 1))
        upd[k] = field.at[slots].set(jnp.where(sel, v, cur))
    upd["alive"] = model.alive.at[slots].set(mask | model.alive[slots])
    upd["max_radii2d"] = model.max_radii2d.at[slots].set(
        jnp.where(mask, 0.0, model.max_radii2d[slots])
    )
    upd["xyz_gradient_accum"] = model.xyz_gradient_accum.at[slots].set(
        jnp.where(mask, 0.0, model.xyz_gradient_accum[slots])
    )
    upd["denom"] = model.denom.at[slots].set(jnp.where(mask, 0.0, model.denom[slots]))
    return model._replace(**upd)


@functools.partial(jax.jit, static_argnames=("max_new",))
def densify_and_prune(
    model: BackgroundModel,
    opt_mu,
    opt_nu,
    key,
    grad_threshold,
    min_opacity,
    extent,
    max_screen_size,
    percent_dense,
    max_new: int,
):
    """One densification step (densify_and_prune, gm_background.py:418-447):
    clone small high-grad Gaussians, split large high-grad ones (N=2, sampled
    inside the parent, scale/1.6), then prune transparent/huge ones.

    ``max_new`` caps clones+splits per call (static shape); excess candidates
    with the smallest grads are deferred to the next call. Adam moments
    (opt_mu/opt_nu: pytrees matching the TRAINABLE fields) are zeroed for new
    rows — the reference's cat_tensors_to_optimizer surgery (:319-347).
    Returns (model, opt_mu, opt_nu, stats).
    """
    max_new = min(max_new, model.capacity)
    grads = jnp.where(model.denom > 0, model.xyz_gradient_accum / model.denom, 0.0)
    scal = model.get_scaling
    max_scale = scal.max(-1)

    high = (grads >= grad_threshold) & model.alive
    clone_mask = high & (max_scale <= percent_dense * extent)
    split_mask = high & (max_scale > percent_dense * extent)

    # rank candidates by grad so the cap keeps the most-demanding ones
    cand_mask = clone_mask | split_mask
    score = jnp.where(cand_mask, grads, -1.0)
    order = jnp.argsort(-score)[:max_new]
    sel = cand_mask[order]                      # (max_new,)
    src = order

    is_split = split_mask[src]
    # clone: copy row as-is. split: sample child inside parent, shrink scale
    # by 0.8*N (N=2 -> /1.6); parent row is resampled in place (the reference
    # prunes the parent and adds two children; identical distribution).
    noise = jax.random.normal(key, (max_new, 3)) * scal[src]
    rot = quat_to_rotmat(normalize(model.rotation[src]))
    offset = jnp.einsum("nij,nj->ni", rot, noise)
    child_xyz = model.xyz[src] + offset
    child_scaling = jnp.log(jnp.maximum(scal[src] / 1.6, 1e-12))

    new_rows = dict(
        xyz=jnp.where(is_split[:, None], child_xyz, model.xyz[src]),
        color=model.color[src],
        scaling=jnp.where(is_split[:, None], child_scaling, model.scaling[src]),
        rotation=model.rotation[src],
        opacity=model.opacity[src],
    )
    # parent of a split also gets resampled+shrunk in place
    noise2 = jax.random.normal(jax.random.fold_in(key, 1), (max_new, 3)) * scal[src]
    parent_xyz = model.xyz[src] + jnp.einsum("nij,nj->ni", rot, noise2)
    model = model._replace(
        xyz=model.xyz.at[src].set(jnp.where((is_split & sel)[:, None], parent_xyz, model.xyz[src])),
        scaling=model.scaling.at[src].set(
            jnp.where((is_split & sel)[:, None], child_scaling, model.scaling[src])
        ),
    )

    dead_first = jnp.argsort(model.alive.astype(jnp.int32), stable=True)
    slots = dead_first[jnp.arange(max_new)]
    num_dead = model.capacity - model.alive.sum()
    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
    fits = sel & (rank < num_dead)
    model = _write_rows(model, new_rows, slots, fits)

    # zero Adam moments for written slots and for the in-place-modified parents
    def zero_rows(tree):
        def z(leaf, field):
            leaf = leaf.at[slots].set(jnp.where(fits.reshape((-1,) + (1,) * (leaf.ndim - 1)), 0.0, leaf[slots]))
            return leaf

        return {k: z(v, k) for k, v in tree.items()}

    opt_mu = zero_rows(opt_mu)
    opt_nu = zero_rows(opt_nu)

    # prune (gm_background.py:425-431)
    prune = (model.get_opacity[:, 0] < min_opacity) & model.alive
    big_vs = model.max_radii2d > max_screen_size
    big_ws = model.get_scaling.max(-1) > 0.1 * extent
    prune = jnp.where(max_screen_size > 0, prune | big_vs | big_ws, prune)
    model = model._replace(
        alive=model.alive & ~prune,
        xyz_gradient_accum=jnp.zeros_like(model.xyz_gradient_accum),
        denom=jnp.zeros_like(model.denom),
        max_radii2d=jnp.zeros_like(model.max_radii2d),
    )
    stats = dict(cloned=(fits & ~is_split).sum(), split=(fits & is_split).sum(),
                 pruned=prune.sum(), dropped=sel.sum() - fits.sum())
    return model, opt_mu, opt_nu, stats


@jax.jit
def reset_opacity(model: BackgroundModel) -> BackgroundModel:
    """Clamp opacity to <= 0.01 (reset_opacity, gm_background.py:231-234)."""
    new_op = inv_sigmoid(jnp.minimum(model.get_opacity, 0.01))
    return model._replace(opacity=new_op)


def prune_near_points(model: BackgroundModel, valid_min_y, valid_max_z,
                      object_center=None, object_radius=None) -> BackgroundModel:
    """Domain prune (prune_near_points, gm_background.py:449-458)."""
    near = model.xyz[:, 2] > valid_max_z
    upper = model.xyz[:, 1] > valid_min_y
    prune = near & upper
    if object_center is not None:
        outside = jnp.sum((model.xyz - jnp.asarray(object_center)) ** 2, -1) > object_radius**2
        prune = prune & outside
    return model._replace(alive=model.alive & ~prune)


def prune_near_cam_points(model: BackgroundModel, cam_locations, smoke_location) -> BackgroundModel:
    """Prune Gaussians nearer to any camera than the smoke is
    (prune_near_cam_points, gm_background.py:460-465)."""
    cams = jnp.asarray(cam_locations, jnp.float32)
    smoke = jnp.asarray(smoke_location, jnp.float32).reshape(1, 3)
    smoke_d = jnp.linalg.norm(smoke[:, None] - cams[None], axis=-1)  # (1,M)
    d = jnp.linalg.norm(model.xyz[:, None] - cams[None], axis=-1)    # (C,M)
    near = jnp.any(d < smoke_d, axis=1)
    return model._replace(alive=model.alive & ~near)


def prune_large_points(model: BackgroundModel, threshold=0.03) -> BackgroundModel:
    """(prune_large_points, gm_background.py:467-470)"""
    large = model.get_scaling.max(-1) > threshold
    return model._replace(alive=model.alive & ~large)
