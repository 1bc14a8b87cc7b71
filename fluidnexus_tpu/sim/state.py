"""Particle state pytrees — static-capacity redesign of the reference's
dynamically-growing torch tensors (gm_dynamics.py: `_xyz`, `_velocity`, ...,
grown by torch.cat in emit_new_particles:935-975 and shrunk by boolean
indexing in remove_invalid_particles:1033).

On TPU, shapes must be static under jit: buffers are allocated at a fixed
``capacity`` with an ``alive`` mask. Emission writes into dead slots;
removal clears the mask; ``compact`` (stable alive-first reorder) keeps
locality without changing shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ParticleState(NamedTuple):
    """Hidden PBF particles (scaled space, i.e. world * scale_factor)."""

    xyz: jnp.ndarray            # (N,3)
    estimate_xyz: jnp.ndarray   # (N,3)
    velocity: jnp.ndarray       # (N,3)
    force: jnp.ndarray          # (N,3)
    buoyancy: jnp.ndarray       # (N,3)
    imass: jnp.ndarray          # (N,) inverse mass (1 for fluid)
    counts: jnp.ndarray         # (N,) solver-iteration counter (PBF delta averaging)
    particle_id: jnp.ndarray    # (N,) int32 stable ids
    alive: jnp.ndarray          # (N,) bool
    next_id: jnp.ndarray        # () int32 — next id to assign

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self):
        return self.alive.sum()


class VisualState(NamedTuple):
    """Visual (rendering) particles; appearance attrs live in the splat model."""

    xyz: jnp.ndarray    # (V,3)
    alive: jnp.ndarray  # (V,) bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self):
        return self.alive.sum()


def make_particle_state(capacity: int, init_xyz=None, init_velocity_y: float = 0.0,
                        gravity_alpha_buoyancy=None) -> ParticleState:
    """Allocate a capacity-N state; optionally seed the first rows from
    ``init_xyz`` (mirrors create_particles_hidden, gm_dynamics.py:557-610)."""
    z3 = jnp.zeros((capacity, 3), jnp.float32)
    st = ParticleState(
        xyz=z3, estimate_xyz=z3, velocity=z3, force=z3,
        buoyancy=jnp.zeros((capacity, 3), jnp.float32) if gravity_alpha_buoyancy is None
        else jnp.broadcast_to(jnp.asarray(gravity_alpha_buoyancy, jnp.float32), (capacity, 3)),
        imass=jnp.ones((capacity,), jnp.float32),
        counts=jnp.zeros((capacity,), jnp.float32),
        particle_id=jnp.zeros((capacity,), jnp.int32),
        alive=jnp.zeros((capacity,), bool),
        next_id=jnp.zeros((), jnp.int32),
    )
    if init_xyz is not None:
        n = init_xyz.shape[0]
        assert n <= capacity, f"init {n} > capacity {capacity}"
        vel = jnp.zeros((n, 3), jnp.float32).at[:, 1].set(init_velocity_y)
        st = st._replace(
            xyz=st.xyz.at[:n].set(init_xyz),
            estimate_xyz=st.estimate_xyz.at[:n].set(init_xyz),
            velocity=st.velocity.at[:n].set(vel),
            particle_id=st.particle_id.at[:n].set(jnp.arange(n, dtype=jnp.int32)),
            alive=st.alive.at[:n].set(True),
            next_id=jnp.asarray(n, jnp.int32),
        )
    return st


def make_visual_state(capacity: int, init_xyz=None) -> VisualState:
    st = VisualState(xyz=jnp.zeros((capacity, 3), jnp.float32), alive=jnp.zeros((capacity,), bool))
    if init_xyz is not None:
        n = init_xyz.shape[0]
        assert n <= capacity
        st = st._replace(xyz=st.xyz.at[:n].set(init_xyz), alive=st.alive.at[:n].set(True))
    return st


def emit_into_dead_slots(state, new_xyz, new_mask, extra_updates=None):
    """Scatter up to M new particles into dead slots (lowest indices first).

    state: ParticleState or VisualState. new_xyz (M,3); new_mask (M,) marks
    which of the M candidates are real this frame (static M, dynamic count).
    extra_updates: dict field -> (M,...) values to scatter alongside.
    Candidates that don't fit (no dead slots left) are dropped.
    Returns (new_state, num_dropped).
    """
    cap = state.capacity
    m = new_xyz.shape[0]
    # stable sort: dead slots (False) first, preserving index order
    dead_first = jnp.argsort(state.alive.astype(jnp.int32), stable=True)
    slot_for_candidate = dead_first[jnp.arange(m)]  # m <= cap assumed
    num_dead = cap - state.alive.sum()
    cand_rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1  # rank among valid candidates
    fits = new_mask & (cand_rank < num_dead)
    # compact valid candidates to the front so they map to the first dead slots
    order = jnp.argsort(~fits, stable=True)
    slot = slot_for_candidate  # first M dead slots in index order
    src = jax.tree.map(lambda a: a[order], new_xyz) if not isinstance(new_xyz, jnp.ndarray) else new_xyz[order]
    src_mask = fits[order]

    def scatter(field, values):
        return field.at[slot].set(jnp.where(src_mask.reshape((-1,) + (1,) * (values.ndim - 1)), values, field[slot]))

    updates = {"xyz": scatter(state.xyz, src)}
    if isinstance(state, ParticleState):
        updates["estimate_xyz"] = scatter(state.estimate_xyz, src)
    if extra_updates:
        for k, v in extra_updates.items():
            updates[k] = scatter(getattr(state, k), v[order])
    updates["alive"] = state.alive.at[slot].set(src_mask | state.alive[slot])
    num_dropped = new_mask.sum() - fits.sum()
    return state._replace(**updates), num_dropped


def compact(state):
    """Stable alive-first reorder (shape-preserving defragmentation)."""
    order = jnp.argsort(~state.alive, stable=True)
    return jax.tree.map(lambda a: a[order] if a.ndim >= 1 and a.shape[0] == state.capacity else a, state)
