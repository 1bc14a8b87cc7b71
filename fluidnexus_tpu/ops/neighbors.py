"""Fixed-radius neighbor search — jittable, static-shape.

Replaces ``torch_cluster.radius`` / ``radius_graph`` (the PBF solver backbone,
reference gm_dynamics.py:10,1081). Instead of the reference's dynamic edge
lists (COO ``edge_index`` + ``index_add_``), queries return PADDED dense
neighbor lists ``(Nq, K)`` with a validity mask: every downstream reduction
becomes a masked sum over axis 1 — dense, static-shape math that XLA tiles
onto the VPU, with no scatter in the hot path.

Algorithm: spatial hashing. Points are binned into cells of edge ``r`` via the
classic xor-of-primes hash into a power-of-two table; each query point gathers
candidates from its 27 surrounding cells and keeps the K nearest within ``r``
(ties to the nearest — unlike torch_cluster's arbitrary first-K, this is
deterministic and physically sensible). Hash collisions only add false
candidates, which the distance test filters.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_P1, _P2, _P3 = 73856093, 19349663, 83492791


class NeighborList(NamedTuple):
    idx: jnp.ndarray    # (Nq, K) int32 indices into the data set (0 where invalid)
    mask: jnp.ndarray   # (Nq, K) bool
    overflow: jnp.ndarray  # () int32: points dropped from over-full cells (diagnostic)

    @property
    def count(self):
        return self.mask.sum(-1)


def _cell_hash(cell_xyz, table_size):
    h = (cell_xyz[..., 0] * _P1) ^ (cell_xyz[..., 1] * _P2) ^ (cell_xyz[..., 2] * _P3)
    return (h & (table_size - 1)).astype(jnp.int32)


def _next_pow2(n):
    return 1 << max(1, (int(n) - 1).bit_length())


def _build_table(x, alive_x, r, table_size, cell_capacity):
    """Scatter data points into hash-table buckets of fixed capacity."""
    n = x.shape[0]
    cell = jnp.floor(x / r).astype(jnp.int32)
    cid = _cell_hash(cell, table_size)
    cid = jnp.where(alive_x, cid, table_size)  # park dead points in a sentinel cell

    order = jnp.argsort(cid)
    cid_sorted = cid[order]
    # rank within the run of equal cell ids
    first = jnp.searchsorted(cid_sorted, cid_sorted, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)

    buckets = jnp.full((table_size + 1, cell_capacity), -1, jnp.int32)
    ok = rank < cell_capacity
    buckets = buckets.at[jnp.where(ok, cid_sorted, table_size), jnp.where(ok, rank, 0)].set(
        jnp.where(ok, order.astype(jnp.int32), -1), mode="drop"
    )
    overflow = jnp.sum(~ok & (cid_sorted < table_size))
    return buckets[:table_size], overflow


@functools.partial(
    jax.jit, static_argnames=("k", "include_self", "table_size", "cell_capacity")
)
def _radius_impl(x, y, alive_x, alive_y, self_idx, r, k, include_self, table_size, cell_capacity):
    buckets, overflow = _build_table(x, alive_x, r, table_size, cell_capacity)

    qcell = jnp.floor(y / r).astype(jnp.int32)
    off = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"), -1
    ).reshape(27, 3).astype(jnp.int32)
    ncells = qcell[:, None, :] + off[None, :, :]                # (Nq,27,3)
    nh = _cell_hash(ncells, table_size)                          # (Nq,27)
    cand = buckets[nh].reshape(y.shape[0], 27 * cell_capacity)   # (Nq, 27*M)

    cand_ok = cand >= 0
    cand_safe = jnp.maximum(cand, 0)
    d2 = jnp.sum((y[:, None, :] - x[cand_safe]) ** 2, -1)
    r2 = r * r
    good = cand_ok & (d2 <= r2) & alive_x[cand_safe] & alive_y[:, None]
    if not include_self and self_idx is not None:
        good = good & (cand != self_idx[:, None])
    # 27 cells can hash-collide onto the same bucket -> duplicate candidates.
    # Dedup: invalidate repeats of the same index within a row.
    srt = jnp.sort(jnp.where(good, cand, jnp.iinfo(jnp.int32).max), axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros_like(srt[:, :1], bool), srt[:, 1:] == srt[:, :-1]], axis=1
    )
    # map duplicates back by re-sorting positions: instead, mark good entries
    # whose first occurrence is elsewhere using a rank trick
    key = jnp.where(good, cand, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key, axis=1)
    inv = jnp.argsort(order, axis=1)
    dup = jnp.take_along_axis(dup_sorted, inv, axis=1)
    good = good & ~dup

    # keep K nearest: sort by (invalid, distance)
    sort_key = jnp.where(good, d2, jnp.inf)
    sel = jnp.argsort(sort_key, axis=1)[:, :k]
    idx = jnp.take_along_axis(cand_safe, sel, axis=1)
    msk = jnp.take_along_axis(good, sel, axis=1)
    return NeighborList(idx=jnp.where(msk, idx, 0), mask=msk, overflow=overflow)


def radius_query(x, y, r, k, alive_x=None, alive_y=None, table_size=None, cell_capacity=32):
    """Neighbors of each query ``y`` among data points ``x`` within radius ``r``.

    Equivalent of ``torch_cluster.radius(x=x, y=y, r=r, max_num_neighbors=k)``
    (used at gm_dynamics.py:1369,1465) but returns the K *nearest* as a padded
    (Nq, K) list. ``alive_*`` mask padding rows of static-capacity buffers.
    """
    n = x.shape[0]
    if alive_x is None:
        alive_x = jnp.ones((n,), bool)
    if alive_y is None:
        alive_y = jnp.ones((y.shape[0],), bool)
    ts = table_size or _next_pow2(2 * n)
    return _radius_impl(x, y, alive_x, alive_y, None, jnp.asarray(r, x.dtype), k, True, ts, cell_capacity)


def radius_graph(x, r, k, loop=False, alive=None, table_size=None, cell_capacity=32):
    """All-pairs fixed-radius neighbors of ``x`` with itself.

    Equivalent of ``torch_cluster.radius_graph(x, r, loop=loop,
    max_num_neighbors=k)`` (gm_dynamics.py:1081) as a padded (N, K) list.
    With ``loop=True`` the self-edge is guaranteed present (distance 0 sorts
    first), matching the reference's use for density sums.
    """
    n = x.shape[0]
    if alive is None:
        alive = jnp.ones((n,), bool)
    ts = table_size or _next_pow2(2 * n)
    self_idx = jnp.arange(n, dtype=jnp.int32)
    return _radius_impl(x, x, alive, alive, self_idx, jnp.asarray(r, x.dtype), k, loop, ts, cell_capacity)
