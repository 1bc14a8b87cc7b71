"""Ablation bench for the PBF phase1 pair kernel at the 28k workload.

Variants (local copies of sim/pbf_pallas._phase1_kernel, one feature toggled
each) to attribute the measured ms between elementwise math, cross-lane sum
trees, MXU alternatives, and branch/DMA floor:

  full      — production kernel (VPU jnp.sum row reductions)
  mxudots   — row sums as SEPARATE (S,M)@(M,4) HIGHEST dots (no concats;
              the r3 "stacked" loser concatenated lhs blocks — this doesn't)
  nosum     — elementwise math kept live, all row reductions replaced by
              taking column 0 (isolates the sum-tree cost)
  floor     — body only touches xc (branch + DMA + grid overhead floor)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pbf_ablate.py
"""
import functools

import numpy as np

from tools.bench_pbf_breakdown import timeit


def make_phase1(mode):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fluidnexus_tpu.sim import pbf_pallas as pp
    from fluidnexus_tpu.sim.pbf_pallas import (CPB, STRIP, _SELF_J, _gathers,
                                               _pad_c, _shift31)

    def kernel(h, eps, c6, s45, m, cnt_ref, ncnt_ref, xc_ref, xng_ref,
               pi_ref, sg_ref, c2_ref, nl_ref):
        h2 = h * h
        pid = pl.program_id(0)
        pi_ref[...] = jnp.zeros(pi_ref.shape, pi_ref.dtype)
        sg_ref[...] = jnp.zeros(sg_ref.shape, sg_ref.dtype)
        c2_ref[...] = jnp.zeros(c2_ref.shape, c2_ref.dtype)
        nl_ref[...] = jnp.zeros(nl_ref.shape, nl_ref.dtype)
        # debranched variants (mode "nobr*"): no per-(cell,offset) @pl.when —
        # empty blocks are numerically inert via the sentinel coords, and the
        # "floor" ablation shows the ~46k predicated regions cost ~20 ms alone
        nojbr = mode.startswith("nobr")

        for ci in range(CPB):
            cell = pid * CPB + ci

            @pl.when(cnt_ref[cell] > 0)
            def _():
                for j in range(27):
                    shift = _shift31(j, h)

                    def jblock():
                        xs = xng_ref[ci, 3 * j:3 * j + 3] + shift
                        S = m if mode == "nobr_flat" else min(STRIP, m)
                        for s in range(m // S):
                            sl = slice(s * S, (s + 1) * S)

                            def strip(sl=sl, S=S, s=s, xs=xs):
                                xc = xc_ref[ci, sl]
                                if mode == "floor":
                                    pi_ref[ci, sl] += xc[:, 0:1]
                                    return
                                dx0 = xc[:, 0:1] - xs[0:1, :]
                                dx1 = xc[:, 1:2] - xs[1:2, :]
                                dx2 = xc[:, 2:3] - xs[2:3, :]
                                d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                                if j == _SELF_J:
                                    seye = (lax.broadcasted_iota(
                                        jnp.int32, (S, m), 0) + s * S
                                        == lax.broadcasted_iota(
                                            jnp.int32, (S, m), 1))
                                    d2 = jnp.where(seye, 0.0, d2)
                                t2 = h2 - d2
                                w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0)
                                inv = lax.rsqrt(d2 + eps)
                                rlen = (d2 + eps) * inv
                                hr = h - rlen
                                cg = jnp.where(rlen < h,
                                               (-s45) * hr * hr * inv, 0.0)
                                if j == _SELF_J:
                                    cg = jnp.where(seye, 0.0, cg)
                                inl = (d2 <= h2).astype(jnp.float32)
                                if mode in ("full", "nobr", "nobr_flat"):
                                    rs_cg = jnp.sum(cg, axis=1, keepdims=True)
                                    wxs = lax.dot_general(
                                        cg, xs.T, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=lax.Precision.HIGHEST)
                                    pi_ref[ci, sl] += jnp.sum(
                                        w, axis=1, keepdims=True)
                                    sg_ref[ci, sl] += rs_cg * xc - wxs
                                    c2_ref[ci, sl] += jnp.sum(
                                        cg * cg * d2, axis=1, keepdims=True)
                                    nl_ref[ci, sl] += jnp.sum(
                                        inl, axis=1, keepdims=True)
                                elif mode == "nosum":
                                    pi_ref[ci, sl] += w[:, 0:1]
                                    sg_ref[ci, sl] += (cg[:, 0:1] * xc
                                                       - xs.T[0:S + 0][:S])
                                    c2_ref[ci, sl] += (cg * cg * d2)[:, 0:1]
                                    nl_ref[ci, sl] += inl[:, 0:1]
                                elif mode == "mxudots":
                                    ri = lax.broadcasted_iota(
                                        jnp.int32, (m, 4), 1)
                                    rhs = jnp.where(
                                        ri == 0, 1.0,
                                        jnp.where(ri == 1, xs.T[:, 0:1],
                                                  jnp.where(ri == 2,
                                                            xs.T[:, 1:2],
                                                            xs.T[:, 2:3])))
                                    dot = lambda a: lax.dot_general(
                                        a, rhs, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=lax.Precision.HIGHEST)
                                    dcg = dot(cg)          # (S,4)
                                    dw = dot(w)
                                    dc2 = dot(cg * cg * d2)
                                    dnl = dot(inl)
                                    pi_ref[ci, sl] += dw[:, 0:1]
                                    sg_ref[ci, sl] += (dcg[:, 0:1] * xc
                                                       - dcg[:, 1:4])
                                    c2_ref[ci, sl] += dc2[:, 0:1]
                                    nl_ref[ci, sl] += dnl[:, 0:1]

                            if mode == "nobr_flat":
                                strip()
                            else:
                                pl.when(cnt_ref[cell] > s * S)(strip)

                    if nojbr:
                        jblock()
                    else:
                        pl.when(ncnt_ref[cell * 27 + j] > 0)(jblock)

    def run(grid, h, eps, c6, s45):
        c, m = grid.nbr.shape[0], grid.capacity
        cnt, bs, xng = _gathers(grid)
        ncnt = cnt[grid.nbr].reshape(-1)        # (C*27,) for the *br variants
        xc = bs[:-1]
        (xc, xng), cp = _pad_c([xc, xng], c)
        cnt_p = jnp.pad(cnt[:-1], (0, cp - c))
        ncnt = jnp.pad(ncnt, (0, (cp - c) * 27))
        g = cp // CPB
        kern = functools.partial(kernel, float(h), float(eps), float(c6),
                                 float(s45), m)
        blk = lambda *s: pl.BlockSpec(
            (CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(g,),
                in_specs=[blk(m, 3), blk(81, m)],
                out_specs=(blk(m, 1), blk(m, 3), blk(m, 1), blk(m, 1)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
                jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
                jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
                jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            ),
        )(cnt_p, ncnt, xc, xng)
        return out[0].sum() + out[1].sum() + out[2].sum() + out[3].sum()

    return run


def main():
    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.ops.neighbors import build_dense_grid
    from fluidnexus_tpu.sim.pbf import PBFParams
    from fluidnexus_tpu.sim.state import make_particle_state

    rng = np.random.default_rng(0)
    params = PBFParams(h=2.0, p0=1.5, k=3.0, secs=0.033,
                       dense_max_cells=2048, dense_cell_capacity=128)
    px = rng.uniform(-8, 8, (28000, 3)).astype(np.float32) + np.array(
        [32.6, 10, -30], np.float32)
    state = make_particle_state(32768, jnp.asarray(px), init_velocity_y=50.0)
    C, M = params.dense_max_cells, params.dense_cell_capacity
    h = float(params.h)
    grid = jax.jit(lambda x, a: build_dense_grid(x, h, a, C, M))(
        state.estimate_xyz, state.alive)

    occ = int((grid.bmask[:-1].sum(-1) > 0).sum())
    fill = float(grid.bmask[:-1].sum()) / max(occ, 1)
    print(f"occupied cells {occ}/{C}  mean fill {fill:.1f}/{M}")

    args = (h, float(params.epsilon), float(params.poly6_term1),
            float(params.spiky_grad_term1))
    ref = None
    ncnt_live = jnp.asarray(
        (grid.bmask.sum(-1)[grid.nbr] > 0) & (grid.bmask[:-1].sum(-1) > 0)[:, None])
    print(f"live j-blocks {int(ncnt_live.sum())}/{occ * 27}")
    for mode in ["full", "nobr", "nobr_flat", "nosum", "floor"]:
        fn = jax.jit(make_phase1(mode), static_argnums=(1, 2, 3, 4))
        t = timeit(lambda: fn(grid, *args))
        chk = float(fn(grid, *args))
        note = ""
        if mode == "full":
            ref = chk
        elif mode == "mxudots" and ref is not None:
            note = f"  (rel vs full {abs(chk - ref) / abs(ref):.2e})"
        print(f"phase1[{mode:8s}]  {t:7.2f} ms   fence={chk:.6g}{note}")


if __name__ == "__main__":
    main()
