"""Differentiable tile-based 3D Gaussian rasterizer — TPU-native design.

Replaces the reference CUDA extensions ``gaussian_rasterization_ch3`` /
``gaussian_rasterization_ch1`` (FluidDynamics/submodules/*, forward.cu /
backward.cu / rasterizer_impl.cu). Behavioral parity targets are cited
per-step below; the *implementation* is a from-scratch XLA program:

  CUDA reference                         This module (XLA/TPU)
  -------------------------------------  ----------------------------------
  per-thread preprocess + frustum cull   vectorized ``project_gaussians``
  dynamic duplication w/ cub radix sort  static D-slot duplication + lexsort
    over 64-bit (tile|depth) keys          ``lax.sort`` on (tile, depth) keys
  identifyTileRanges                     vectorized ``searchsorted``
  per-tile shared-mem front-to-back      per-tile top-K gather + chunked
    blending w/ warp early-out             ``lax.scan`` cumprod compositing
  atomicAdd gradient backward            plain JAX autodiff through gather
                                           (reverse of gather = segment-sum,
                                            which XLA lowers to sorted scatter)

Everything is static-shape and jit-compatible: particle/Gaussian count N,
duplicate capacity D = dup_x*dup_y tiles per Gaussian, and per-tile capacity K
are compile-time constants. Gaussians covering more than dup_x x dup_y tiles
get their tile rect clamped around the projected center (quality knob; raise
``dup_x/dup_y`` for scenes with huge Gaussians). Channel count is inferred
from ``colors`` — ch1 vs ch3 of the reference is just C here (config.h:15).

Semantics matched to forward.cu:149-373:
  - EWA 2D covariance with the 1.3*tan_fov frustum clamp and +0.3 low-pass
  - radius = ceil(3*sqrt(max eigenvalue)), eigenvalue floor 0.1
  - alpha = min(0.99, opacity * exp(power)), skipped when power > 0 or
    alpha < 1/255
  - early stop when transmittance < 1e-4 (here: contributions are masked once
    T < 1e-4 instead of freezing T — difference bounded by 1e-4)
  - median depth: starts at 15.0, set where T crosses 0.5 (forward.cu:295,351)
  - out = accumulated_color + T * bg
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RasterizerConfig:
    tile_x: int = 16
    tile_y: int = 16
    dup_x: int = 4            # max tiles a Gaussian may span horizontally
    dup_y: int = 4            # ... vertically (D = dup_x * dup_y dup slots)
    tile_capacity: int = 256  # max Gaussians composited per tile (front-most K)
    chunk: int = 32           # Gaussians per compositing scan step
    near: float = 0.2         # frustum near-cull plane (auxiliary.h in_frustum)
    backend: str = "xla"      # "xla" | "pallas" | "auto" (pallas on TPU when shapes allow)
    tight_cull: bool = True   # drop (gaussian,tile) slots that cannot reach
                              # alpha 1/255 anywhere in the tile (output-exact;
                              # see _build_tile_lists)
    rmw_combine: bool = True  # pallas VMEM-resident RMW gradient combine
                              # instead of XLA's sorted scatter-add (pallas
                              # backend only). In-graph device A/B at the 32k
                              # bench workload: 95.7 -> 120.3 fps, grads equal
                              # to 3e-8 (see rasterizer_pallas.combine_rows_rmw
                              # for the full device study)
    seg_adjoint: bool = False  # segmented-scan gather adjoint instead of XLA's
                              # sorted scatter-add (see _gather_rows_segsum).
                              # Device-measured LOSER at the 32k bench workload:
                              # 70.9 fps vs 96.0 fps with the XLA scatter-add
                              # (same session, r3) — the sort + doubling-step
                              # masked adds cost more than the scatter they
                              # replace. Kept gated for smaller-D workloads.

    def resolved_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        ok_shapes = (self.tile_x * self.tile_y) % 128 == 0
        return "pallas" if (jax.default_backend() == "tpu" and ok_shapes) else "xla"


class Projected(NamedTuple):
    xy: jnp.ndarray        # (N,2) pixel-space means
    conic: jnp.ndarray     # (N,3) inverse 2D covariance (a,b,c)
    depth: jnp.ndarray     # (N,) view-space z
    radius: jnp.ndarray    # (N,) screen-space radius in pixels (0 = culled)
    valid: jnp.ndarray     # (N,) bool


class RasterOutput(NamedTuple):
    color: jnp.ndarray     # (C,H,W)
    depth: jnp.ndarray     # (H,W) median depth
    final_t: jnp.ndarray   # (H,W) final transmittance
    radii: jnp.ndarray     # (N,) int32 screen radii (densification stats)


def _transform_rows(p, m):
    """Row-vector transform: (p,1) @ m for (N,3) points and (4,4) matrix."""
    return p @ m[:3] + m[3]


def project_gaussians(
    means3d,
    scales,
    rotations,
    view_matrix,
    proj_matrix,
    tan_fovx,
    tan_fovy,
    width,
    height,
    scale_modifier=1.0,
    cov3d=None,
    near=0.2,
    alive=None,
    xy_offset=None,
):
    """Vectorized preprocess: world -> screen. Mirrors preprocessCUDA
    (forward.cu:149-248) semantics; see module docstring for the math.

    TPU layout note: every intermediate is a flat (N,) vector — N rides the
    128-lane axis, so the whole preprocess fuses into a couple of full-width
    elementwise kernels. The naive (N,3)/(N,3,3) batched-matmul formulation
    pads the trailing dim 3 -> 128 lanes (42x wasted lanes) and measured ~6x
    slower end-to-end (fwd+bwd) on v5e.
    """
    f32 = jnp.float32
    mt = means3d.astype(f32).T                       # (3,N)
    mx, my, mz = mt[0], mt[1], mt[2]
    vm = view_matrix.astype(f32)
    pvx = mx * vm[0, 0] + my * vm[1, 0] + mz * vm[2, 0] + vm[3, 0]
    pvy = mx * vm[0, 1] + my * vm[1, 1] + mz * vm[2, 1] + vm[3, 1]
    tz = mx * vm[0, 2] + my * vm[1, 2] + mz * vm[2, 2] + vm[3, 2]
    in_front = tz > near

    pm = proj_matrix.astype(f32)
    hx = mx * pm[0, 0] + my * pm[1, 0] + mz * pm[2, 0] + pm[3, 0]
    hy = mx * pm[0, 1] + my * pm[1, 1] + mz * pm[2, 1] + pm[3, 1]
    hw = mx * pm[0, 3] + my * pm[1, 3] + mz * pm[2, 3] + pm[3, 3]
    p_w = 1.0 / (hw + 1e-7)

    # world-space covariance Sigma = R diag(s^2) R^T, expanded per element
    # (computeCov3D, forward.cu:116-149; quat convention general_utils.py:113)
    if cov3d is None:
        st = (scale_modifier * scales).astype(f32).T  # (3,N)
        s0, s1, s2 = st[0] ** 2, st[1] ** 2, st[2] ** 2
        qt = rotations.astype(f32).T                  # (4,N)
        qr, qx, qy, qz = qt[0], qt[1], qt[2], qt[3]
        qn = jax.lax.rsqrt(jnp.maximum(qr * qr + qx * qx + qy * qy + qz * qz, 1e-24))
        qr, qx, qy, qz = qr * qn, qx * qn, qy * qn, qz * qn
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qr * qz)
        r02 = 2 * (qx * qz + qr * qy)
        r10 = 2 * (qx * qy + qr * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qr * qx)
        r20 = 2 * (qx * qz - qr * qy)
        r21 = 2 * (qy * qz + qr * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)
        c00 = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
        c01 = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
        c02 = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
        c11 = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
        c12 = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
        c22 = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    else:
        cov3d = cov3d.astype(f32)
        c00, c01, c02 = cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2]
        c11, c12, c22 = cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2]

    # EWA: cov2d = J R Sigma R^T J^T with the perspective Jacobian at the
    # frustum-clamped view point (computeCov2D, forward.cu:71-112).
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    # avoid 0-division for behind-camera points (they are culled anyway)
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = jnp.clip(pvx / tz_safe, -limx, limx) * tz
    ty = jnp.clip(pvy / tz_safe, -limy, limy) * tz

    # R_wc: world->cam rotation. view_matrix is stored transposed (row conv),
    # so the math rotation's rows are view_matrix[:3,:3]'s columns. Rows of
    # JW = J @ R_wc expanded per element:
    z2 = tz_safe * tz_safe
    j00 = focal_x / tz_safe
    j02 = -(focal_x * tx) / z2
    j11 = focal_y / tz_safe
    j12 = -(focal_y * ty) / z2
    w00, w01, w02 = vm[0, 0], vm[1, 0], vm[2, 0]   # r_wc row 0
    w10, w11, w12 = vm[0, 1], vm[1, 1], vm[2, 1]
    w20, w21, w22 = vm[0, 2], vm[1, 2], vm[2, 2]
    a0 = j00 * w00 + j02 * w20
    a1 = j00 * w01 + j02 * w21
    a2 = j00 * w02 + j02 * w22
    b0 = j11 * w10 + j12 * w20
    b1 = j11 * w11 + j12 * w21
    b2 = j11 * w12 + j12 * w22
    # quadratic forms a^T Sigma a, a^T Sigma b, b^T Sigma b
    sa0 = c00 * a0 + c01 * a1 + c02 * a2
    sa1 = c01 * a0 + c11 * a1 + c12 * a2
    sa2 = c02 * a0 + c12 * a1 + c22 * a2
    cxx = a0 * sa0 + a1 * sa1 + a2 * sa2 + 0.3
    cxy = b0 * sa0 + b1 * sa1 + b2 * sa2
    cyy = (b0 * (c00 * b0 + c01 * b1 + c02 * b2)
           + b1 * (c01 * b0 + c11 * b1 + c12 * b2)
           + b2 * (c02 * b0 + c12 * b1 + c22 * b2) + 0.3)

    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    det_inv = 1.0 / det_safe
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], -1)

    mid = 0.5 * (cxx + cyy)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    px = ((hx * p_w + 1.0) * width - 1.0) * 0.5
    py = ((hy * p_w + 1.0) * height - 1.0) * 0.5
    xy = jnp.stack([px, py], -1)
    if xy_offset is not None:
        # zero-valued hook: grad w.r.t. xy_offset is the screen-space mean
        # gradient the reference exposes via its dummy means2D tensor
        # (pipe_dynamics.py:60-66) and uses for densification stats
        # (gm_background.py:472-476)
        xy = xy + xy_offset

    valid = in_front & (jnp.abs(det) > 0.0) & (radius > 0.0)
    if alive is not None:
        valid = valid & alive
    radius = jnp.where(valid, radius, 0.0)
    return Projected(xy=xy, conic=conic, depth=tz, radius=radius, valid=valid)


def _tile_rects(proj: Projected, cfg: RasterizerConfig, tiles_x, tiles_y):
    """Tile bounding rects per Gaussian, clamped to dup_x x dup_y around the
    center tile (getRect, auxiliary.h:43-50 + static-capacity clamp)."""
    px, py, r = proj.xy[:, 0], proj.xy[:, 1], proj.radius
    xmin = jnp.clip(jnp.floor((px - r) / cfg.tile_x), 0, tiles_x).astype(jnp.int32)
    xmax = jnp.clip(jnp.floor((px + r + cfg.tile_x - 1) / cfg.tile_x), 0, tiles_x).astype(jnp.int32)
    ymin = jnp.clip(jnp.floor((py - r) / cfg.tile_y), 0, tiles_y).astype(jnp.int32)
    ymax = jnp.clip(jnp.floor((py + r + cfg.tile_y - 1) / cfg.tile_y), 0, tiles_y).astype(jnp.int32)
    # clamp rect extents to the duplicate capacity, keeping the center tile
    cx = jnp.clip((px / cfg.tile_x).astype(jnp.int32), 0, tiles_x - 1)
    cy = jnp.clip((py / cfg.tile_y).astype(jnp.int32), 0, tiles_y - 1)
    w = xmax - xmin
    h = ymax - ymin
    xmin = jnp.where(w > cfg.dup_x, jnp.clip(cx - cfg.dup_x // 2, xmin, xmax - cfg.dup_x), xmin)
    ymin = jnp.where(h > cfg.dup_y, jnp.clip(cy - cfg.dup_y // 2, ymin, ymax - cfg.dup_y), ymin)
    w = jnp.minimum(w, cfg.dup_x)
    h = jnp.minimum(h, cfg.dup_y)
    return xmin, ymin, w, h


def _build_tile_lists(proj: Projected, cfg: RasterizerConfig, tiles_x: int, tiles_y: int,
                      opacities=None):
    """Duplicate Gaussians into tile slots, lexsort by (tile, depth), and cut
    per-tile top-K lists. Static-shape analog of duplicateWithKeys + radix
    sort + identifyTileRanges (rasterizer_impl.cu:67-133).

    Tight culling (beyond the reference's rect test): a (gaussian, tile) slot
    is dropped when even the MAX of its alpha over the tile cannot reach the
    1/255 compositing cutoff. Conservative eigenvalue bound: power(p) <=
    -d(p)^2 / (2*lam1) with d the Euclidean distance to the tile rect and
    lam1 the 2D covariance's top eigenvalue (radius = ceil(3*sqrt(lam1))), so
    culling iff d^2 > 2*ln(255*op)*lam1 removes only entries the per-pixel
    alpha test (forward.cu:329-338) would skip anyway — output-exact, but
    tiles overflow their K capacity later and sparse tiles run the
    half-length kernel branch more often."""
    n = proj.xy.shape[0]
    d = cfg.dup_x * cfg.dup_y
    num_tiles = tiles_x * tiles_y

    xmin, ymin, w, h = _tile_rects(proj, cfg, tiles_x, tiles_y)
    slot = jnp.arange(d, dtype=jnp.int32)
    dx = slot % cfg.dup_x
    dy = slot // cfg.dup_x
    # (N,D) tile ids; sentinel num_tiles for unused slots
    in_rect = (dx[None, :] < w[:, None]) & (dy[None, :] < h[:, None]) & proj.valid[:, None]
    tx0 = (xmin[:, None] + dx[None, :]).astype(jnp.float32) * cfg.tile_x
    ty0 = (ymin[:, None] + dy[None, :]).astype(jnp.float32) * cfg.tile_y
    if opacities is not None and cfg.tight_cull:
        px = proj.xy[:, 0:1]
        py = proj.xy[:, 1:2]
        ddx = jnp.maximum(jnp.maximum(tx0 - px, px - (tx0 + cfg.tile_x)), 0.0)
        ddy = jnp.maximum(jnp.maximum(ty0 - py, py - (ty0 + cfg.tile_y)), 0.0)
        lam1 = (proj.radius[:, None] / 3.0) ** 2
        thresh = 2.0 * jnp.maximum(jnp.log(255.0 * opacities[:, None]), 0.0) * lam1
        in_rect = in_rect & (ddx * ddx + ddy * ddy <= thresh)
    tile = (ymin[:, None] + dy[None, :]) * tiles_x + (xmin[:, None] + dx[None, :])
    tile = jnp.where(in_rect, tile, num_tiles).astype(jnp.int32)

    gidx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, d))

    # sort by (tile, depth): fuse into ONE int32 key (tile * n_pow2 + depth
    # rank) when it fits — a single-key radix-style sort is ~2x cheaper than
    # the lexicographic two-key sort (the reference packs a 64-bit tile|depth
    # key the same way, rasterizer_impl.cu:67-106)
    # NOTE on the gather adjoint: a scatter-free backward (inverse-permutation
    # gather + dense 9:1 reduce) was implemented and device-profiled — it
    # LOST to XLA's sorted-scatter lowering by ~4 ms/frame (the arbitrary-
    # order 295k-row gather, the starts[t_flat] 1-D gather, and a transposed
    # s32[N,9] relayout each cost 2-4 ms; XLA's sort+segment-combine adjoint
    # of packed[tile_gauss] is ~2.7 ms total). Keep the plain gather.
    n_pow2 = 1 << max(1, (n - 1).bit_length())
    if (num_tiles + 1) * n_pow2 < 2**31:
        depth_rank = jnp.zeros((n,), jnp.int32).at[jnp.argsort(proj.depth)].set(
            jnp.arange(n, dtype=jnp.int32))
        key = tile * n_pow2 + depth_rank[:, None]
        # keys are globally unique (depth_rank is a permutation, so within a
        # tile every key differs; across tiles the tile prefix differs) —
        # an unstable sort is bit-identical and drops the stability iota XLA
        # otherwise co-sorts (device-profiled: the stable 3-array sort was
        # 0.42 ms/step at the bench workload)
        sorted_key, sorted_gidx = jax.lax.sort(
            (key.reshape(-1), gidx.reshape(-1)), num_keys=1, is_stable=False)
    else:
        sorted_key = None
        depth = jnp.broadcast_to(proj.depth[:, None], (n, d)).astype(jnp.float32)
        _, _, sorted_gidx = jax.lax.sort(
            (tile.reshape(-1), depth.reshape(-1), gidx.reshape(-1)), num_keys=2
        )

    if sorted_key is not None:
        # per-tile [start, end) straight off the SORTED fused keys: tile t's
        # run is exactly [searchsorted(t*n_pow2), searchsorted((t+1)*n_pow2))
        # — ONE vectorized bisection (19 rounds over a (T+1,) query vector)
        # replaces the dense (T, N*D) compare+cumsum, which the r5 step trace
        # pinned at 16.9 ms/step (300M int compares in a layout-crippled
        # fusion) at the 2-cam 32k bench workload.
        bounds = jnp.searchsorted(
            sorted_key, jnp.arange(num_tiles + 1, dtype=jnp.int32) * n_pow2,
            side="left").astype(jnp.int32)
        starts, ends = bounds[:-1], bounds[1:]
    else:
        tids = jnp.arange(num_tiles, dtype=jnp.int32)
        # per-tile counts by dense compare + cumsum (no fused key available)
        counts = jnp.sum((tile.reshape(-1)[None, :] == tids[:, None])
                         .astype(jnp.int32), axis=1)
        ends = jnp.cumsum(counts).astype(jnp.int32)
        starts = ends - counts

    k = cfg.tile_capacity
    pos = starts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    live = pos < ends[:, None]
    # Wide-row cut instead of sorted_gidx[pos]: XLA's 196k-element 1-D gather
    # costs ~1.3 ms on v5e; fetching 8-consecutive-int rows at starts>>3 and
    # realigning with 8 static-slice selects costs ~0.2 ms for the same data.
    w = k // 8 + 1
    pad = (-(n * d)) % 8 + 8 * w
    g8 = jnp.pad(sorted_gidx, (0, pad)).reshape(-1, 8)
    widx = (starts >> 3)[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]
    wide = g8[widx].reshape(num_tiles, w * 8)
    shift = starts & 7
    tile_gauss = jnp.zeros((num_tiles, k), jnp.int32)
    for s in range(8):
        tile_gauss = jnp.where((shift == s)[:, None],
                               jax.lax.slice(wide, (0, s), (num_tiles, s + k)), tile_gauss)
    return tile_gauss, live


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_rows_segsum(packed, idx, idx_bwd, max_run):
    """``packed[idx]`` with a hand-rolled reverse pass.

    XLA's adjoint of a row gather is a sorted scatter-add whose segment
    combine walks rows serially (device-profiled 2.6 ms for (196k, 10) ->
    (32k, 10) while touching 1.3 MB — ~200x off memory roofline; row
    gathers of the same shape run at 0.25 ms). This adjoint stays dense:

      sort (id, position) -> gather cotangent rows into id order ->
      segmented inclusive scan by doubling (every op full-lane (L, F)) ->
      one unique-row gather of each id's run tail.

    The scan window is 2^ceil(log2(max_run)), so it is exact only when no id
    repeats more than ``max_run`` times. ``idx_bwd`` guarantees that: dead
    slots (tile-window spillover can replicate one Gaussian across many
    windows) carry the out-of-range sentinel ``n``, leaving each real id
    with at most dup_x*dup_y live rows — their cotangents are zero anyway
    (masked by ``live`` downstream), exactly as in the scatter adjoint.
    """
    del idx_bwd, max_run
    return packed[idx]


def _gather_rows_segsum_fwd(packed, idx, idx_bwd, max_run):
    return packed[idx], (idx_bwd, packed.shape[0])


def _gather_rows_segsum_bwd(max_run, res, g):
    idx_bwd, n = res
    flat = idx_bwd.reshape(-1)
    el = g.shape[-1]
    gf = g.reshape(-1, el)
    length = flat.shape[0]
    sid, pos = jax.lax.sort(
        (flat, jnp.arange(length, dtype=jnp.int32)), num_keys=1, is_stable=True)
    gs = gf[pos]
    # doubling segmented scan: after steps k=1,2,..,K the row i holds the sum
    # of its run's last min(2K, prefix_len) rows — runs are <= max_run, so the
    # run tail holds the full run sum once 2K >= max_run
    k = 1
    while k < max_run:
        same = sid[k:] == sid[:-k]
        gs = jnp.concatenate(
            [gs[:k], gs[k:] + jnp.where(same[:, None], gs[:-k], 0.0)], axis=0)
        k *= 2
    gids = jnp.arange(n, dtype=jnp.int32)
    tp = jnp.searchsorted(sid, gids, side="right").astype(jnp.int32) - 1
    tpc = jnp.maximum(tp, 0)
    found = (tp >= 0) & (sid[tpc] == gids)
    out = jnp.where(found[:, None], gs[tpc], 0.0)
    return out, None, None


_gather_rows_segsum.defvjp(_gather_rows_segsum_fwd, _gather_rows_segsum_bwd)


def _live_counts(live):
    """Per-tile live-slot counts (live is a front-packed prefix mask)."""
    return live.sum(-1).astype(jnp.int32)


@jax.custom_vjp
def _gather_rows_rmw(packed, idx, cnt):
    """``packed[idx]`` whose reverse pass is the Pallas VMEM-resident RMW
    combine (rasterizer_pallas.combine_rows_rmw) instead of XLA's sorted
    scatter-add. ``cnt`` bounds each tile's loop to its live prefix."""
    return packed[idx]


def _gather_rows_rmw_fwd(packed, idx, cnt):
    return packed[idx], (idx, cnt, packed.shape[0])


def _gather_rows_rmw_bwd(res, g):
    idx, cnt, n = res
    from fluidnexus_tpu.ops.rasterizer_pallas import combine_rows_rmw

    return combine_rows_rmw(g, idx, cnt, n), None, None


_gather_rows_rmw.defvjp(_gather_rows_rmw_fwd, _gather_rows_rmw_bwd)


# Adjoint experiments, all device-benched at the 32k/960x544 workload and
# all LOSING to XLA's default row-wise sorted-scatter adjoint (89.6 fps):
#   - inverse-permutation gather + dense 9:1 reduce: 63 fps (arbitrary-order
#     295k-row gather 3.6 ms, starts[t_flat] gather 2.4 ms, s32[N,9]
#     transposed relayout 3.8 ms)
#   - F per-column 1-D scatter-adds (full-lane combines): 48 fps (ten
#     sorted combines + (T,K,F)->(T*K,) column relayouts)
# The default adjoint's 2.6 ms combine keeps only 10/128 lanes busy but
# sorts once and never relayouts — keep it.


def _composite_tiles(tile_gauss, live, proj: Projected, colors, opacities, cfg, tiles_x, tiles_y):
    """Front-to-back alpha compositing of per-tile Gaussian lists.

    Chunked lax.scan over the K axis with a remat'd body: the backward pass
    recomputes per-chunk alphas instead of storing (tiles, K, pixels) residuals
    — the TPU substitute for the reference's shared-memory streaming loop
    (renderCUDA, forward.cu:250-373) and its hand-written backward.
    """
    f32 = jnp.float32
    num_tiles, k = tile_gauss.shape
    c = colors.shape[-1]
    p = cfg.tile_x * cfg.tile_y

    tx = jnp.arange(num_tiles, dtype=jnp.int32) % tiles_x
    ty = jnp.arange(num_tiles, dtype=jnp.int32) // tiles_x
    px = tx[:, None] * cfg.tile_x + jnp.tile(jnp.arange(cfg.tile_x, dtype=jnp.int32), cfg.tile_y)[None, :]
    py = ty[:, None] * cfg.tile_y + jnp.repeat(jnp.arange(cfg.tile_y, dtype=jnp.int32), cfg.tile_x)[None, :]
    pixf = jnp.stack([px, py], -1).astype(f32)  # (T,P,2)

    ck = cfg.chunk
    n_chunks = k // ck
    assert k % ck == 0, "tile_capacity must be a multiple of chunk"
    gidx_chunks = tile_gauss.reshape(num_tiles, n_chunks, ck).transpose(1, 0, 2)
    live_chunks = live.reshape(num_tiles, n_chunks, ck).transpose(1, 0, 2)

    def chunk_body(carry, chunk):
        t_run, accum, med, med_set = carry
        gids, lv = chunk  # (T,CK)
        xy = proj.xy[gids]                     # (T,CK,2)
        con = proj.conic[gids]                 # (T,CK,3)
        op = opacities[gids]                   # (T,CK)
        col = colors[gids]                     # (T,CK,C)
        dep = proj.depth[gids]                 # (T,CK)

        dxy = xy[:, :, None, :] - pixf[:, None, :, :]       # (T,CK,P,2)
        dx, dy = dxy[..., 0], dxy[..., 1]
        power = -0.5 * (con[..., 0:1] * dx * dx + con[..., 2:3] * dy * dy) - con[..., 1:2] * dx * dy
        alpha = jnp.minimum(0.99, op[..., None] * jnp.exp(power))
        skip = (power > 0.0) | (alpha < (1.0 / 255.0)) | ~lv[..., None]
        a_eff = jnp.where(skip, 0.0, alpha)                 # (T,CK,P)

        one_minus = 1.0 - a_eff
        t_incl = jnp.cumprod(one_minus, axis=1)             # (T,CK,P)
        t_before = t_run[:, None, :] * jnp.concatenate(
            [jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]], axis=1
        )
        t_after = t_before * one_minus
        alive_px = t_before >= 1e-4                          # early-stop mask
        wgt = a_eff * t_before * alive_px                    # (T,CK,P)

        accum = accum + jnp.einsum("tkp,tkc->tpc", wgt, col, precision=jax.lax.Precision.HIGHEST)

        cross = (t_before > 0.5) & (t_after < 0.5) & ~skip & alive_px
        # transmittance is monotone: at most one crossing over all chunks
        med_new = jnp.einsum("tkp,tk->tp", cross.astype(f32), dep, precision=jax.lax.Precision.HIGHEST)
        med = jnp.where(med_set | ~jnp.any(cross, axis=1), med, med_new)
        med_set = med_set | jnp.any(cross, axis=1)

        t_run = t_run * t_incl[:, -1, :]
        return (t_run, accum, med, med_set), None

    init = (
        jnp.ones((num_tiles, p), f32),
        jnp.zeros((num_tiles, p, c), f32),
        jnp.full((num_tiles, p), 15.0, f32),   # median-depth default (forward.cu:295)
        jnp.zeros((num_tiles, p), bool),
    )
    (t_run, accum, med, _), _ = jax.lax.scan(
        jax.checkpoint(chunk_body), init, (gidx_chunks, live_chunks)
    )
    return t_run, accum, med


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "config", "scale_modifier"),
)
def rasterize(
    means3d,
    colors,
    opacities,
    scales=None,
    rotations=None,
    cov3d=None,
    alive=None,
    xy_offset=None,
    *,
    view_matrix,
    proj_matrix,
    campos=None,  # kept for API parity with the reference binding; unused (SH is external)
    tan_fovx,    # scalar, traced (cameras may differ per step without recompiles)
    tan_fovy,
    width: int,
    height: int,
    bg_color,
    scale_modifier: float = 1.0,
    config: RasterizerConfig = RasterizerConfig(),
):
    """Render Gaussians to an image. Returns RasterOutput(color (C,H,W), depth,
    final_t, radii). Fully differentiable w.r.t. means3d / colors / opacities /
    scales / rotations (the tile ordering is treated as non-differentiable,
    exactly like the reference backward).

    ``opacities`` is the activated opacity in [0,1], shape (N,) or (N,1).
    ``alive`` optionally masks out padding rows of static-capacity buffers.
    """
    cfg = config
    opacities = opacities.reshape(-1)
    tiles_x = -(-width // cfg.tile_x)
    tiles_y = -(-height // cfg.tile_y)

    proj = project_gaussians(
        means3d, scales, rotations, view_matrix, proj_matrix,
        tan_fovx, tan_fovy, width, height, scale_modifier, cov3d, cfg.near, alive,
        xy_offset,
    )
    tile_gauss, live = _build_tile_lists(
        jax.tree.map(jax.lax.stop_gradient, proj), cfg, tiles_x, tiles_y,
        opacities=jax.lax.stop_gradient(opacities),
    )
    if cfg.resolved_backend() == "pallas":
        from fluidnexus_tpu.ops.rasterizer_pallas import composite_tiles_packed

        # ONE packed gather (differentiable; reverse = one sorted scatter-add
        # — see the adjoint note in _build_tile_lists): five separate (T,K)
        # row-gathers cost ~3x more HBM round trips. The packed rows feed the
        # kernel as-is (column slicing happens in VMEM) and the packed
        # gradient comes back the same way — no XLA slice/concat relayouts on
        # the (T,K,F) tensors.
        packed = jnp.concatenate(
            [proj.xy, proj.conic, opacities[:, None], colors,
             jax.lax.stop_gradient(proj.depth)[:, None]], axis=1)
        if cfg.seg_adjoint:
            n = packed.shape[0]
            idx_bwd = jnp.where(live, tile_gauss, n)
            packed_t = _gather_rows_segsum(packed, tile_gauss, idx_bwd,
                                           cfg.dup_x * cfg.dup_y)
        elif cfg.rmw_combine:
            packed_t = _gather_rows_rmw(packed, tile_gauss,
                                        _live_counts(live))
        else:
            packed_t = packed[tile_gauss]                  # (T, K, 7+C)
        accum4, t_run3, med3 = composite_tiles_packed(
            packed_t, live.astype(jnp.float32), tiles_x, cfg.tile_x, cfg.tile_y,
        )
        num_tiles = tiles_x * tiles_y
        p = cfg.tile_x * cfg.tile_y
        accum = accum4.reshape(num_tiles, -1, p).transpose(0, 2, 1)  # (T,P,C)
        t_run = t_run3.reshape(num_tiles, p)
        med = med3.reshape(num_tiles, p)
    else:
        t_run, accum, med = _composite_tiles(tile_gauss, live, proj, colors, opacities, cfg, tiles_x, tiles_y)

    c = colors.shape[-1]
    h_pad, w_pad = tiles_y * cfg.tile_y, tiles_x * cfg.tile_x

    def untile(img_tp):  # (T,P,...) -> (H,W,...)
        img = img_tp.reshape(tiles_y, tiles_x, cfg.tile_y, cfg.tile_x, -1)
        img = img.transpose(0, 2, 1, 3, 4).reshape(h_pad, w_pad, -1)
        return img[:height, :width]

    bg = jnp.asarray(bg_color, jnp.float32).reshape(-1)
    out = untile(accum) + untile(t_run[..., None]) * bg  # (H,W,C)
    return RasterOutput(
        color=out.transpose(2, 0, 1),
        depth=untile(med[..., None])[..., 0],
        final_t=untile(t_run[..., None])[..., 0],
        radii=proj.radius.astype(jnp.int32),
    )
