"""Dynamics Gaussian model: hidden PBF particles + visual render particles +
frozen background Gaussians.

TPU rebuild of the reference ``gm_dynamics.py`` GaussianModel (2154 LoC class)
as a pytree + pure functions. ``gm_fluid`` (the ScalarReal variant,
gm_fluid.py) is this model with ``background=None`` and a 1-channel renderer.

Responsibilities mirrored here:
  - particle creation (create_particles_visual:510, create_particles_hidden:557)
  - emitter precompute + per-frame emission (prepare_emitter_points:674,
    emit_new_particles:844) under static capacities
  - constant-appearance rendering attrs (prepare_*_for_rendering:1643-1699:
    color 0.7, log-scale -5.9, opacity 0.1; rigid: 0.9/-5.5/0.3)
  - per-frame npy checkpoint I/O (save_hidden:1834, save_visual:1901,
    load_hidden:1991, load_visual:2067, load_visual_smoothed:2095)
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.sim.pbf import GRAVITY, PBFParams
from fluidnexus_tpu.sim.state import (
    ParticleState, VisualState, emit_into_dead_slots, make_particle_state, make_visual_state,
)
from fluidnexus_tpu.utils.maths import inv_sigmoid

CONSTANT_COLOR = 0.7      # ref gm_dynamics.py:178-180
CONSTANT_SCALE = -5.9
CONSTANT_OPACITY = 0.1


class VisualAttrs(NamedTuple):
    """Appearance of visual particles (level-two fit targets); capacity-sized."""

    color: jnp.ndarray     # (V,C) raw
    scales: jnp.ndarray    # (V,3) log
    rotation: jnp.ndarray  # (V,4)
    opacity: jnp.ndarray   # (V,1) pre-sigmoid


def constant_visual_attrs(capacity: int, channels: int = 1) -> VisualAttrs:
    rot = jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0)
    return VisualAttrs(
        color=jnp.full((capacity, channels), CONSTANT_COLOR, jnp.float32),
        scales=jnp.full((capacity, 3), CONSTANT_SCALE, jnp.float32),
        rotation=rot,
        opacity=jnp.full((capacity, 1), float(inv_sigmoid(jnp.asarray(CONSTANT_OPACITY))), jnp.float32),
    )


@dataclasses.dataclass
class BackgroundSplats:
    """Frozen background Gaussians loaded from the stage-1 PLY."""

    xyz: jnp.ndarray
    color: jnp.ndarray
    scaling: jnp.ndarray   # log
    rotation: jnp.ndarray
    opacity: jnp.ndarray   # pre-sigmoid

    @classmethod
    def from_ply(cls, path: str):
        from fluidnexus_tpu.core.ply import load_background_ply

        d = load_background_ply(path)
        return cls(
            xyz=jnp.asarray(d["xyz"]), color=jnp.asarray(d["color"]),
            scaling=jnp.asarray(d["scaling"]), rotation=jnp.asarray(d["rotation"]),
            opacity=jnp.asarray(d["opacity"]),
        )

    @property
    def n(self):
        return self.xyz.shape[0]


# --------------------------------- creation ----------------------------------


def create_visual_points(m, rng: np.random.Generator) -> np.ndarray:
    """Random cylinder-ish column of visual particles (create_particles_visual,
    gm_dynamics.py:510-556). m is a ModelConfig. WORLD units."""
    n, nt = m.init_visual_num_pts, max(m.init_thick_visual_num_pts, 0)
    y = rng.uniform(m.init_visual_y_min, m.init_visual_y_max, (n, 1))
    r = rng.random((n, 1)) * m.init_visual_radius_small_max
    if nt > 0:
        y = np.concatenate([y, rng.uniform(m.init_visual_y_thick_min, m.init_visual_y_max, (nt, 1))], 0)
        r = np.concatenate([r, rng.random((nt, 1)) * m.init_visual_radius_max], 0)
    th = rng.random((n + nt, 1)) * 2 * np.pi
    x = r * np.cos(th) + m.init_x_mid
    z = r * np.sin(th) + m.init_z_mid
    return np.concatenate([x, y, z], 1).astype(np.float32)


def create_hidden_points(m) -> np.ndarray:
    """Uniform lattice pillar (create_particles_hidden, gm_dynamics.py:557-610).
    Returns SCALED (x100) coordinates like the reference."""
    d = m.init_hidden_delta
    xr = np.arange(m.init_x_mid - m.init_hidden_radius_max, m.init_x_mid + m.init_hidden_radius_max + d, d)
    yr = np.arange(m.init_hidden_y_min, m.init_hidden_y_max, d)
    zr = np.arange(m.init_z_mid - m.init_hidden_radius_max, m.init_z_mid + m.init_hidden_radius_max + d, d)
    X, Y, Z = np.meshgrid(xr, yr, zr, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    keep = (pts[:, 0] - m.init_x_mid) ** 2 + (pts[:, 2] - m.init_z_mid) ** 2 <= m.init_hidden_radius_max**2
    return (pts[keep] * 100.0).astype(np.float32)


def _disk_lattice(center_x, center_z, y_values, radius, delta) -> np.ndarray:
    xr = np.arange(center_x - radius, center_x + radius + delta, delta)
    zr = np.arange(center_z - radius, center_z + radius + delta, delta)
    pts = []
    for x in xr:
        for y in np.atleast_1d(y_values):
            for z in zr:
                if (x - center_x) ** 2 + (z - center_z) ** 2 <= radius**2:
                    pts.append([x, y, z])
    return np.asarray(pts, np.float32)


@dataclasses.dataclass
class EmitterPoints:
    """Precomputed emitter lattices (prepare_emitter_points, :674-745 and the
    future-first variant :747-790). WORLD units; scaled at emit time."""

    hidden: np.ndarray
    visual: np.ndarray
    hidden_first: np.ndarray
    visual_first: np.ndarray

    @classmethod
    def from_config(cls, m, is_future: bool = False):
        vr = m.emitter_visual_delta * m.emitter_visual_radius_ratio
        hr = m.emitter_hidden_delta * m.emitter_hidden_radius_ratio
        vy = m.emitter_center_y_visual - vr / 2 if is_future else m.emitter_center_y_visual
        visual = _disk_lattice(m.init_x_mid, m.init_z_mid, [vy], vr, m.emitter_visual_delta)
        hidden = _disk_lattice(m.init_x_mid, m.init_z_mid, [m.emitter_center_y_hidden], hr, m.emitter_hidden_delta)
        vy_first = np.arange(m.emitter_center_y_visual, m.emitter_center_y_visual + vr * 2 + m.emitter_visual_delta,
                             m.emitter_visual_delta)
        hy_first = np.arange(m.emitter_center_y_hidden, m.emitter_center_y_hidden + hr * 2 + m.emitter_hidden_delta,
                             m.emitter_hidden_delta)
        visual_first = _disk_lattice(m.init_x_mid, m.init_z_mid, vy_first, vr, m.emitter_visual_delta)
        hidden_first = _disk_lattice(m.init_x_mid, m.init_z_mid, hy_first, hr, m.emitter_hidden_delta)
        return cls(hidden=hidden, visual=visual, hidden_first=hidden_first, visual_first=visual_first)


def plan_emission(points: np.ndarray, ratio: float, rng: np.random.Generator,
                  scale_factor: float = 100.0):
    """int+fractional emission of an emitter lattice (emit_new_particles,
    gm_dynamics.py:862-889): floor(ratio) full copies + a random subset of
    size int(frac*E). Host-side; returns (M,3) scaled positions."""
    full = int(ratio)
    frac = ratio - full
    out = [points] * full
    if frac > 0:
        sel = rng.permutation(len(points))[: int(frac * len(points))]
        out.append(points[sel])
    if not out:
        return np.zeros((0, 3), np.float32)
    return (np.concatenate(out, 0) * scale_factor).astype(np.float32)


def plan_extra_visual(visual_xyz: np.ndarray, alive: np.ndarray, extra_ratio: float,
                      extra_num: int, y_min: float, min_num: int, visual_delta: float,
                      rng: np.random.Generator, scale_factor: float = 100.0) -> np.ndarray:
    """Resample high visual particles with jitter (emit_new_particles
    :891-931). Host-side numpy."""
    out = []
    high = visual_xyz[alive]
    high = high[high[:, 1] > y_min * scale_factor]
    if extra_ratio > 0 and len(high) > 0:
        num = max(int(len(high) * extra_ratio), min_num)
        sel = rng.permutation(len(high))[:num]
        base = high[sel] / scale_factor
        off = (rng.random(base.shape).astype(np.float32) - 0.5) * visual_delta * 0.05
        out.append((base + off) * scale_factor)
    if extra_num > 0 and len(high) > 0:
        sel = rng.permutation(len(high))[:extra_num]
        base = high[sel] / scale_factor
        off = (rng.random(base.shape).astype(np.float32) - 0.5) * visual_delta * 0.05
        out.append((base + off) * scale_factor)
    if not out:
        return np.zeros((0, 3), np.float32)
    return np.concatenate(out, 0).astype(np.float32)


def pad_emission(arr: np.ndarray, cap: int):
    """Pad a host-side (M,3) emission plan to a static capacity + mask so the
    jitted emit path compiles once (dynamic M would retrace every frame)."""
    m = min(arr.shape[0], cap)
    out = np.zeros((cap, 3), np.float32)
    out[:m] = arr[:m]
    mask = np.zeros((cap,), bool)
    mask[:m] = True
    return out, mask


def emit_hidden(state: ParticleState, new_xyz: np.ndarray, init_velocity_y: float,
                gravity_alpha: float, mask: Optional[np.ndarray] = None) -> ParticleState:
    """Append new hidden particles with fresh ids/velocity/buoyancy
    (emit_new_particles :933-975)."""
    mcount = new_xyz.shape[0]
    if mcount == 0:
        return state
    new_xyz_j = jnp.asarray(new_xyz)
    mask = jnp.ones((mcount,), bool) if mask is None else jnp.asarray(mask)
    vel = jnp.zeros((mcount, 3), jnp.float32).at[:, 1].set(init_velocity_y)
    buoy = jnp.broadcast_to(jnp.asarray(GRAVITY) * gravity_alpha, (mcount, 3))
    ids = state.next_id + jnp.cumsum(mask.astype(jnp.int32)) - 1
    st, dropped = emit_into_dead_slots(
        state, new_xyz_j, mask,
        extra_updates=dict(velocity=vel, buoyancy=buoy,
                           force=jnp.zeros((mcount, 3), jnp.float32),
                           imass=jnp.ones((mcount,), jnp.float32),
                           counts=jnp.zeros((mcount,), jnp.float32),
                           particle_id=ids.astype(jnp.int32)),
    )
    # reference also zeroes ALL counts on emission (gm_dynamics.py:961)
    return st._replace(counts=jnp.zeros_like(st.counts),
                       next_id=st.next_id + mask.sum().astype(jnp.int32))


def emit_visual(visual: VisualState, new_xyz: np.ndarray,
                mask: Optional[np.ndarray] = None) -> VisualState:
    if new_xyz.shape[0] == 0:
        return visual
    if mask is None:
        mask = jnp.ones((new_xyz.shape[0],), bool)
    st, _ = emit_into_dead_slots(visual, jnp.asarray(new_xyz), jnp.asarray(mask))
    return st


def remove_bottom_visual(visual: VisualState, scale_factor: float = 100.0) -> VisualState:
    """(remove_invisible_bottom_visual_particles, gm_dynamics.py:1062-1072)"""
    keep = visual.xyz[:, 1] >= -0.017 * scale_factor
    return visual._replace(alive=visual.alive & keep)


# ------------------------------ checkpoint I/O -------------------------------


def save_hidden(state: ParticleState, params: PBFParams, path: str, frame_idx: int,
                extra_scalars: Optional[dict] = None):
    """Per-frame npy checkpoint, reference format (save_hidden, :1834-1898):
    xyz/estimate_xyz are saved DOWN-scaled; only alive rows are written."""
    os.makedirs(path, exist_ok=True)
    a = np.asarray(state.alive)
    pre = os.path.join(path, f"frame_{frame_idx:03d}_")
    np.save(pre + "xyz.npy", np.asarray(state.xyz)[a] / params.scale_factor)
    np.save(pre + "estimate_xyz.npy", np.asarray(state.estimate_xyz)[a] / params.scale_factor)
    np.save(pre + "buoyancy.npy", np.asarray(state.buoyancy)[a])
    np.save(pre + "force.npy", np.asarray(state.force)[a])
    np.save(pre + "velocity.npy", np.asarray(state.velocity)[a])
    np.save(pre + "imass.npy", np.asarray(state.imass)[a][:, None])
    np.save(pre + "counts.npy", np.asarray(state.counts)[a][:, None])
    np.save(pre + "gravity.npy", GRAVITY.reshape(1, 3))
    np.save(pre + "particle_id.npy", np.asarray(state.particle_id)[a][:, None])
    scalars = {
        "scale_factor": params.scale_factor, "secs": params.secs, "alpha": params.alpha,
        "k": params.k, "p0": params.p0, "buoyancy_decay_rate": params.buoyancy_decay_rate,
        "buoyancy_max_y": params.buoyancy_max_y, "min_neighbors": params.min_neighbors,
        "particle_id_max": int(state.next_id),
    }
    scalars.update(extra_scalars or {})
    with open(pre + "scalar_values.json", "w") as f:
        json.dump(scalars, f)


def load_hidden(path: str, frame_idx: int, capacity: int, params: PBFParams) -> ParticleState:
    """(load_hidden, gm_dynamics.py:1991-2064)"""
    pre = os.path.join(path, f"frame_{frame_idx:03d}_")
    xyz = np.load(pre + "xyz.npy") * params.scale_factor
    n = len(xyz)
    st = make_particle_state(capacity)
    st = st._replace(
        xyz=st.xyz.at[:n].set(xyz),
        estimate_xyz=st.estimate_xyz.at[:n].set(np.load(pre + "estimate_xyz.npy") * params.scale_factor),
        buoyancy=st.buoyancy.at[:n].set(np.load(pre + "buoyancy.npy")),
        force=st.force.at[:n].set(np.load(pre + "force.npy")),
        velocity=st.velocity.at[:n].set(np.load(pre + "velocity.npy")),
        imass=st.imass.at[:n].set(np.load(pre + "imass.npy").reshape(-1)),
        counts=st.counts.at[:n].set(np.load(pre + "counts.npy").reshape(-1)),
        particle_id=st.particle_id.at[:n].set(np.load(pre + "particle_id.npy").reshape(-1).astype(np.int32)),
        alive=st.alive.at[:n].set(True),
    )
    with open(pre + "scalar_values.json") as f:
        scalars = json.load(f)
    return st._replace(next_id=jnp.asarray(scalars.get("particle_id_max", n), jnp.int32))


def save_visual(visual: VisualState, attrs: VisualAttrs, path: str, frame_idx: int,
                scale_factor: float = 100.0, scale: bool = True):
    """(save_visual, :1901-1924)"""
    os.makedirs(path, exist_ok=True)
    a = np.asarray(visual.alive)
    pre = os.path.join(path, f"frame_{frame_idx:03d}_")
    xyz = np.asarray(visual.xyz)[a]
    np.save(pre + "visual_xyz.npy", xyz / scale_factor if scale else xyz)
    np.save(pre + "visual_color.npy", np.asarray(attrs.color)[a])
    np.save(pre + "visual_scales.npy", np.asarray(attrs.scales)[a])
    np.save(pre + "visual_rotation.npy", np.asarray(attrs.rotation)[a])
    np.save(pre + "visual_opacity.npy", np.asarray(attrs.opacity)[a])


def load_visual(path: str, frame_idx: int, capacity: int, channels: int = 1,
                scale_factor: float = 100.0, smoothed_window: Optional[int] = None,
                use_smoothed=None, scale: bool = True):
    """(load_visual :2067 / load_visual_smoothed :2095 — the smoothed variant
    reads `*_smoothed_ws{w}.npy` attribute files where enabled). With
    scale=False positions are loaded as saved, i.e. world units (the level-two
    stage renders pos_type="visual" unscaled — train_visual_particle.py:107)."""
    pre = os.path.join(path, f"frame_{frame_idx:03d}_")
    xyz = np.load(pre + "visual_xyz.npy")
    if scale:
        xyz = xyz * scale_factor
    n = len(xyz)
    vis = make_visual_state(capacity, jnp.asarray(xyz.astype(np.float32)))

    def attr(name, flag):
        p = pre + f"visual_{name}.npy"
        if smoothed_window and use_smoothed and use_smoothed.get(name, False):
            ps = pre + f"visual_{name}_smoothed_ws{smoothed_window}.npy"
            if os.path.exists(ps):
                p = ps
        return np.load(p)

    attrs = constant_visual_attrs(capacity, channels)
    color_arr = attr("color", "color")
    if color_arr.shape[1] == 1 and channels == 3:  # level_two_color_3ch
        color_arr = np.repeat(color_arr, 3, 1)
    attrs = VisualAttrs(
        color=attrs.color.at[:n].set(color_arr),
        scales=attrs.scales.at[:n].set(attr("scales", "scales")),
        rotation=attrs.rotation.at[:n].set(attr("rotation", "rotation")),
        opacity=attrs.opacity.at[:n].set(attr("opacity", "opacity")),
    )
    return vis, attrs
