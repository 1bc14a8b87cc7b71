"""Fixed-radius neighbor search — jittable, static-shape.

Replaces ``torch_cluster.radius`` / ``radius_graph`` (the PBF solver backbone,
reference gm_dynamics.py:10,1081). Instead of the reference's dynamic edge
lists (COO ``edge_index`` + ``index_add_``), queries return PADDED dense
neighbor lists ``(Nq, K)`` with a validity mask: every downstream reduction
becomes a masked sum over axis 1 — dense, static-shape math that XLA tiles
onto the VPU, with no scatter in the hot path.

Algorithm: a BOUNDED dense grid (no hashing). Points are binned into cells of
edge ``r`` inside a ``grid^3`` box anchored at the dynamic data minimum; each
query gathers candidates from its 27 surrounding cells (in bucket layout, so
the coordinate fetch is wide row-gathers, not 28M scalar-indexed loads) and
keeps the K nearest within ``r``.

Why no hash (v2, device-profiled): the v1 xor-prime hash allowed the 27
neighbor cells to collide onto one bucket, so every query row needed a
duplicate-invalidation pass — THREE extra (Nq, 27*M) row-sorts that
dominated the 800 ms/call measured at the 32k bench workload. With a dense
grid, distinct in-range cells can never alias; the only duplicates would come
from edge-clamping, and those offsets are EXCLUDED exactly by a per-axis
validity test (an out-of-range neighbor cell holds no points that aren't
already covered by the clamped center cell, because out-of-box points clamp
into the same boundary slab). Points beyond the box stay correct — they just
concentrate in boundary cells, where the fixed ``cell_capacity`` may truncate
(counted in ``overflow``; the reference truncates too, at
``max_num_neighbors`` with an arbitrary-first subset).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class NeighborList(NamedTuple):
    idx: jnp.ndarray    # (Nq, K) int32 indices into the data set (0 where invalid)
    mask: jnp.ndarray   # (Nq, K) bool
    overflow: jnp.ndarray  # () int32: points dropped from over-full cells (diagnostic)

    @property
    def count(self):
        return self.mask.sum(-1)


def _next_pow2(n):
    return 1 << max(1, (int(n) - 1).bit_length())


def _build_grid(x, alive_x, origin, r, grid, cell_capacity):
    """Bin data points into the dense-grid bucket tables.

    Returns (bidx (C+1, M) int32 slot->point with -1 padding, bxyz (C+1, M, 3)
    slot coordinates, overflow). Row C (the sentinel) stays all -1 so invalid
    neighbor-cell ids can safely index it."""
    n = x.shape[0]
    m = cell_capacity
    ncells = grid * grid * grid
    cell = jnp.clip(jnp.floor(x / r).astype(jnp.int32) - origin, 0, grid - 1)
    cid = cell[:, 0] + grid * (cell[:, 1] + grid * cell[:, 2])
    cid = jnp.where(alive_x, cid, ncells)  # park dead points in the sentinel

    order = jnp.argsort(cid).astype(jnp.int32)
    cid_sorted = cid[order]
    # rank within the run of equal cell ids: run-head flags + cummax is one
    # lane-parallel scan; searchsorted(a, a) lowers to a 19-round vmapped
    # while of small gathers (~3 ms at N=32k, device-profiled)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), cid_sorted[1:] != cid_sorted[:-1]])
    first = jax.lax.cummax(jnp.where(head, iota_n, 0))
    rank = iota_n - first

    # SCATTER bucket build (device-profiled FASTER than the scatter-free
    # gather build: 141 vs 212 ms/radius_graph at the 32k bench workload —
    # the (C+1, M) gather over all grid cells loses to one 2-D scatter of N
    # rows when most cells are empty)
    ok = (rank < m) & (cid_sorted < ncells)
    row = jnp.where(ok, cid_sorted, ncells)
    col = jnp.where(ok, rank, 0)
    bidx = jnp.full((ncells + 1, m), -1, jnp.int32)
    bidx = bidx.at[row, col].set(jnp.where(ok, order, -1), mode="drop")
    bxyz = jnp.zeros((ncells + 1, m, 3), x.dtype)
    bxyz = bxyz.at[row, col].set(x[order], mode="drop")
    overflow = jnp.sum((rank >= m) & (cid_sorted < ncells))
    return bidx, bxyz, overflow


import numpy as _np

_OFFSETS = _np.stack(
    _np.meshgrid(*([_np.arange(-1, 2)] * 3), indexing="ij"),
    -1).reshape(27, 3).astype(_np.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "include_self", "grid", "cell_capacity")
)
def _radius_impl(x, y, alive_x, alive_y, self_idx, r, k, include_self, grid,
                 cell_capacity):
    nq = y.shape[0]
    m = cell_capacity
    ncells = grid * grid * grid

    # box anchored at the live-point minimum (over data AND queries so both
    # land at non-negative cell coords)
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    lo = jnp.minimum(
        jnp.min(jnp.where(alive_x[:, None], x, big), axis=0),
        jnp.min(jnp.where(alive_y[:, None], y, big), axis=0))
    origin = jnp.floor(lo / r).astype(jnp.int32)

    bidx, bxyz, overflow = _build_grid(x, alive_x, origin, r, grid, m)

    qcell = jnp.clip(jnp.floor(y / r).astype(jnp.int32) - origin, 0, grid - 1)
    off = jnp.asarray(_OFFSETS)
    nc = qcell[:, None, :] + off[None, :, :]                     # (Nq,27,3)
    # EXACT dedup-free validity: a non-zero offset whose cell is out of range
    # can only alias a clamped in-range cell — every point it could contain
    # already lives in the covered boundary cell, so drop it
    off_ok = jnp.all((off[None] == 0) | ((nc >= 0) & (nc < grid)), axis=-1)
    nid = nc[..., 0] + grid * (nc[..., 1] + grid * nc[..., 2])
    nid = jnp.where(off_ok, nid, ncells)                         # (Nq,27)

    cand = bidx[nid].reshape(nq, 27 * m)                         # (Nq, 27M)
    cxyz = bxyz[nid].reshape(nq, 27 * m, 3)
    cand_ok = cand >= 0
    d2 = jnp.sum((y[:, None, :] - cxyz) ** 2, -1)
    good = cand_ok & (d2 <= r * r) & alive_y[:, None]
    if not include_self and self_idx is not None:
        good = good & (cand != self_idx[:, None])

    # keep K nearest: one row argsort over masked distances (device-profiled
    # marginally cheaper than lax.top_k at the (32k, 864) bench shape)
    sel = jnp.argsort(jnp.where(good, d2, jnp.inf), axis=1)[:, :k]
    idx = jnp.take_along_axis(jnp.maximum(cand, 0), sel, axis=1)
    msk = jnp.take_along_axis(good, sel, axis=1)
    return NeighborList(idx=jnp.where(msk, idx, 0), mask=msk, overflow=overflow)


class DenseGrid(NamedTuple):
    """Compacted cell-bucket tables for dense pair interactions.

    Unlike the padded (N, K) lists above, this keeps points in CELL-MAJOR
    bucket layout so fixed-radius pair sums become batched (M, M) blocks —
    MXU matmuls + VPU elementwise — with no per-pair gather, sort, or top-K
    in the consumer (see sim/pbf_dense.py). Occupied cells are compacted to
    ``C = max_cells`` rows (row C is an all-invalid sentinel).

    Coordinates are stored RELATIVE to each point's own cell corner, so
    pair-block distances stay in [0, ~2r] where f32 is exact; a neighbor
    block at cell offset ``o`` is shifted by ``o * r`` (see consumer).
    """
    bidx: jnp.ndarray      # (C+1, M) int32 slot -> original point id (-1 pad)
    bxyz: jnp.ndarray      # (C+1, M, 3) cell-relative slot coords (0 pad)
    bmask: jnp.ndarray     # (C+1, M) bool slot validity
    nbr: jnp.ndarray       # (C, 27) int32 compacted neighbor-cell row (C = none)
    prow: jnp.ndarray      # (N,) int32 point -> compacted cell row (C = dropped)
    pcol: jnp.ndarray      # (N,) int32 point -> slot column (0 where dropped)
    overflow: jnp.ndarray  # () int32 points dropped (full cells + cell-cap)
    origin: jnp.ndarray = None   # (3,) int32 lattice anchor (cells of edge r)
    ucid: jnp.ndarray = None     # (C,) int32 packed cell id per compacted row
                                 # (_GRID_SENT on unused rows); with ``origin``
                                 # these let a SECOND point set bind to the
                                 # same lattice (see bin_queries)

    @property
    def max_cells(self):
        return self.nbr.shape[0]

    @property
    def capacity(self):
        return self.bidx.shape[1]


_GRID_SENT = jnp.int32(1 << 30)   # > any packed 10-bit-per-axis cell id


def _cell_join(ucid_a, ucid_b, cb):
    """(Ca, 27) compacted row in table ``b`` of each 27-neighborhood cell of
    table ``a``'s compacted cells (``cb`` = none). Dense equality join — see
    the build note below on why not searchsorted."""
    ca = ucid_a.shape[0]
    a_valid = ucid_a < _GRID_SENT
    ux = ucid_a & 1023
    uy = (ucid_a >> 10) & 1023
    uz = ucid_a >> 20
    off = jnp.asarray(_OFFSETS)                                   # (27, 3)
    nx = ux[:, None] + off[None, :, 0]
    ny = uy[:, None] + off[None, :, 1]
    nz = uz[:, None] + off[None, :, 2]
    axis_ok = a_valid[:, None] & ((nx >= 0) & (nx < 1024) & (ny >= 0)
                                  & (ny < 1024) & (nz >= 0) & (nz < 1024))
    ncid = nx + (ny << 10) + (nz << 20)
    iota_b = jnp.arange(1, cb + 1, dtype=jnp.int32)
    hit_row = jnp.max(jnp.where(ncid[:, :, None] == ucid_b[None, None, :],
                                iota_b[None, None, :], 0), axis=-1)
    return jnp.where(axis_ok & (hit_row > 0), hit_row - 1, cb)


@functools.partial(jax.jit, static_argnames=("max_cells", "capacity"))
def build_dense_grid(x, r, alive, max_cells, capacity):
    """Bin points into compacted dense-grid buckets (see :class:`DenseGrid`).

    Cells have edge ``r`` inside a 1024^3 box anchored at the live-point
    minimum; coordinates beyond the box clip into boundary cells (their pairs
    are still distance-masked — only capacity is wasted). The build is
    sort + searchsorted + gathers (one 1-D argsort of N; the only scatters
    are the two unique-index (N,) point->slot maps).

    ``bxyz`` is differentiable w.r.t. ``x`` (cell assignment is
    piecewise-constant, the stored coords are plain gathers minus corners).
    """
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    lo = jnp.min(jnp.where(alive[:, None], jax.lax.stop_gradient(x), big),
                 axis=0)
    origin = jnp.floor(lo / r).astype(jnp.int32)
    return _compact_bins(x, r, alive, origin, max_cells, capacity,
                         self_join=True)


def _compact_bins(x, r, alive, origin, max_cells, capacity, self_join):
    n = x.shape[0]
    C, M = max_cells, capacity
    cc = jnp.clip(jnp.floor(x / r).astype(jnp.int32) - origin, 0, 1023)
    cid = cc[:, 0] + (cc[:, 1] << 10) + (cc[:, 2] << 20)
    cid = jnp.where(alive, cid, _GRID_SENT)

    order = jnp.argsort(cid).astype(jnp.int32)
    cids = cid[order]
    xs = x[order]
    # first-occurrence index per sorted row: run-head flags + cumulative max
    # (one lane-parallel scan; searchsorted(cids, cids) lowers to a 19-round
    # vmapped while of small gathers — device-profiled ~3 ms at N=32k)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), cids[1:] != cids[:-1]])
    first = jax.lax.cummax(jnp.where(head, iota_n, 0))
    rank = iota_n - first
    live = cids < _GRID_SENT
    newcell = (rank == 0) & live
    crank_raw = jnp.cumsum(newcell.astype(jnp.int32)) - 1
    # monotone compacted row per sorted pos (C once past the cap / dead tail)
    crank = jnp.where(live & (crank_raw < C), crank_raw, C)

    # per-cell counts by dense compare (lane-parallel; a searchsorted here is
    # a 15-round while of (C,) gathers) + exclusive cumsum for run starts
    npts = jnp.sum((crank[None, :] == jnp.arange(C, dtype=jnp.int32)[:, None])
                   .astype(jnp.int32), axis=1)
    starts0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(npts)[:-1]])
    u_valid = npts > 0
    ucid = jnp.where(u_valid, cids[jnp.minimum(starts0, n - 1)], _GRID_SENT)

    posg = jnp.minimum(starts0[:, None] + jnp.arange(M, dtype=jnp.int32)[None, :],
                       n - 1)
    slotv = jnp.arange(M, dtype=jnp.int32)[None, :] < jnp.minimum(npts, M)[:, None]
    ux = ucid & 1023
    uy = (ucid >> 10) & 1023
    uz = ucid >> 20
    corner = (jnp.stack([ux, uy, uz], -1) + origin[None, :]).astype(x.dtype) * r
    if x.dtype == jnp.float32 and n < (1 << 24):
        # ONE packed row gather for [coords | point index-as-f32]: the two
        # separate (C, M) gathers over the same posg rows are latency-bound
        # row DMAs (~0.9 ms each at C*M=131k on-chip). The index rides as an
        # exact f32 VALUE (n < 2^24) — a BITCAST of small ints makes
        # denormals, which the TPU flushes (device-verified corruption)
        pk = jnp.concatenate(
            [xs, order.astype(jnp.float32)[:, None]], -1)[posg]  # (C, M, 4)
        bidx = jnp.where(slotv, pk[..., 3].astype(jnp.int32), -1)
        bxyz = (pk[..., :3] - corner[:, None, :]) * slotv[..., None]
    else:
        bidx = jnp.where(slotv, order[posg], -1)
        bxyz = (xs[posg] - corner[:, None, :]) * slotv[..., None]
    bidx = jnp.concatenate([bidx, jnp.full((1, M), -1, jnp.int32)], 0)
    bxyz = jnp.concatenate([bxyz, jnp.zeros((1, M, 3), x.dtype)], 0)
    bmask = jnp.concatenate([slotv, jnp.zeros((1, M), bool)], 0)
    overflow = (jnp.sum(jnp.maximum(npts - M, 0))
                + jnp.sum(live & (crank_raw >= C)))

    # dense equality join instead of searchsorted: ucid is tiny (C rows), so
    # the (C, 27, C) compare streams through the VPU in ~0.3 ms where the
    # binary search lowers to a 12-round while of (C*27,) gathers (~5 ms).
    # Cell ids are unique, so max-of-onehot recovers the single hit row.
    nbr = _cell_join(ucid, ucid, C) if self_join else jnp.full(
        (C, 27), C, jnp.int32)

    keep = live & (rank < M) & (crank_raw < C)
    prow_s = jnp.where(keep, crank, C)
    pcol_s = jnp.where(keep, jnp.minimum(rank, M - 1), 0)
    # one packed row scatter for [prow | pcol]
    prc = jnp.zeros((n, 2), jnp.int32).at[order].set(
        jnp.stack([prow_s, pcol_s], -1), unique_indices=True)
    prow, pcol = prc[:, 0], prc[:, 1]
    return DenseGrid(bidx=bidx, bxyz=bxyz, bmask=bmask, nbr=nbr,
                     prow=prow, pcol=pcol, overflow=overflow,
                     origin=origin, ucid=ucid)


@functools.partial(jax.jit, static_argnames=("max_cells", "capacity"))
def bin_queries(grid: DenseGrid, r, y, alive_y, max_cells, capacity):
    """Bin a SECOND point set onto ``grid``'s lattice for two-set dense pair
    kernels (query points y against source points already in ``grid``).

    Returns ``(qgrid, rnbr)``:
    - ``qgrid``: a :class:`DenseGrid` over the query points, on the SAME cell
      lattice (``grid.origin``), with ``qgrid.nbr`` mapping each compacted
      QUERY cell to the 27 neighbor rows in the SOURCE grid's compacted table
      (``grid.max_cells`` = none) — the forward (query-centric) join.
    - ``rnbr`` (C_src, 27): each SOURCE cell's 27 neighbor rows in the QUERY
      table (``max_cells`` = none) — the adjoint (source-centric) join.

    Queries outside the source 1024^3 box clip into boundary cells (their
    pairs stay distance-masked). Dead / capacity-dropped queries have
    ``prow == max_cells`` (point_gather reads a caller-appended pad row)."""
    qgrid = _compact_bins(y, r, alive_y, grid.origin, max_cells, capacity,
                          self_join=False)
    nbr_q = _cell_join(qgrid.ucid, grid.ucid, grid.max_cells)
    rnbr = _cell_join(grid.ucid, qgrid.ucid, max_cells)
    return qgrid._replace(nbr=nbr_q), rnbr


def slot_gather(grid: DenseGrid, f, fill=0.0):
    """Per-point field -> (C+1, M, ...) slot layout (sentinel row = fill)."""
    g = jnp.where(grid.bmask.reshape(grid.bmask.shape + (1,) * (f.ndim - 1)),
                  f[jnp.maximum(grid.bidx, 0)], fill)
    return g


def point_gather(grid: DenseGrid, slot_field):
    """(C+1, M, ...) slot field -> per-point (N, ...) (dropped points -> row C)."""
    return slot_field[grid.prow, grid.pcol]


def radius_query(x, y, r, k, alive_x=None, alive_y=None, table_size=None,
                 cell_capacity=32, grid_cells=32):
    """Neighbors of each query ``y`` among data points ``x`` within radius ``r``.

    Equivalent of ``torch_cluster.radius(x=x, y=y, r=r, max_num_neighbors=k)``
    (used at gm_dynamics.py:1369,1465) but returns the K *nearest* as a padded
    (Nq, K) list. ``alive_*`` mask padding rows of static-capacity buffers.
    ``table_size`` is accepted for v1 compatibility and ignored (the dense
    grid replaced the hash table); ``grid_cells`` is the box resolution per
    axis (box edge = grid_cells * r, anchored at the data minimum)."""
    n = x.shape[0]
    if alive_x is None:
        alive_x = jnp.ones((n,), bool)
    if alive_y is None:
        alive_y = jnp.ones((y.shape[0],), bool)
    return _radius_impl(x, y, alive_x, alive_y, None, jnp.asarray(r, x.dtype),
                        k, True, grid_cells, cell_capacity)


def radius_graph(x, r, k, loop=False, alive=None, table_size=None,
                 cell_capacity=32, grid_cells=32):
    """All-pairs fixed-radius neighbors of ``x`` with itself.

    Equivalent of ``torch_cluster.radius_graph(x, r, loop=loop,
    max_num_neighbors=k)`` (gm_dynamics.py:1081) as a padded (N, K) list.
    With ``loop=True`` the self-edge is guaranteed present (distance 0 sorts
    first), matching the reference's use for density sums. See
    :func:`radius_query` for ``table_size``/``grid_cells``."""
    n = x.shape[0]
    if alive is None:
        alive = jnp.ones((n,), bool)
    self_idx = jnp.arange(n, dtype=jnp.int32)
    return _radius_impl(x, x, alive, alive, self_idx, jnp.asarray(r, x.dtype),
                        k, loop, grid_cells, cell_capacity)
