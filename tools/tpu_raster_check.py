"""Compiled-Mosaic vs interpreter-mode rasterizer equivalence ON THE CHIP.

The CPU suite exercises the Pallas rasterizer only in interpreter mode
(tests/conftest.py forces CPU; rasterizer_pallas._interpret). Interpreter
semantics can diverge from compiled Mosaic (@pl.when occupancy branches, fp
rounding), so this lane runs the SAME differentiable render twice on the TPU
backend — once compiled, once with interpret forced — and bounds the
difference on the image, final transmittance, and input gradients.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_raster_check.py
"""
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", (
        f"this check needs the TPU backend, got {jax.default_backend()}")

    from fluidnexus_tpu.data.cameras import Camera
    from fluidnexus_tpu.ops import RasterizerConfig, rasterize
    from fluidnexus_tpu.ops import rasterizer_pallas

    rng = np.random.default_rng(7)
    n = 4096
    width, height = 256, 192
    R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
    T = -R.T @ np.array([0.0, 0.0, 3.0])
    cam = Camera(uid=0, R=R, T=T, fovx=0.9, fovy=0.6, width=width, height=height)

    means = jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    ops_ = jnp.asarray(rng.uniform(0.05, 0.9, (n,)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-4.5, -3.0, (n, 3))), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    tgt = jnp.zeros((3, height, width), jnp.float32)
    cfg = RasterizerConfig(tile_x=32, tile_y=32, tile_capacity=256, chunk=32,
                           dup_x=3, dup_y=3, backend="pallas")

    def loss(m, c, o, s, r):
        out = rasterize(m, c, o, s, r, view_matrix=jnp.asarray(cam.world_view),
                        proj_matrix=jnp.asarray(cam.full_proj),
                        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
                        width=width, height=height, bg_color=jnp.zeros(3),
                        config=cfg)
        return jnp.sum((out.color - tgt) ** 2), out.color

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True))

    (l_c, img_c), g_c = jax.tree.map(np.asarray, grad_fn(means, cols, ops_, scales, rots))

    # force interpreter mode and re-run (fresh jit object; the pallas_call
    # interpret flag is read at trace time from the module global)
    rasterizer_pallas._interpret = lambda: True
    assert rasterizer_pallas._interpret() is True
    grad_fn2 = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True))
    (l_i, img_i), g_i = jax.tree.map(np.asarray, grad_fn2(means, cols, ops_, scales, rots))
    rasterizer_pallas._interpret = lambda: jax.default_backend() != "tpu"

    def compare(tag, l_b, img_b, g_b, tol_img, tol_grad):
        img_err = float(np.abs(img_c - img_b).max())
        loss_rel = abs(float(l_c) - float(l_b)) / max(abs(float(l_b)), 1e-9)
        print(f"[{tag}] image max|diff| = {img_err:.3e}  loss rel diff = {loss_rel:.3e}")
        good = img_err < tol_img and loss_rel < 1e-3
        for name, a, bb in zip(("means", "cols", "ops", "scales", "rots"), g_c, g_b):
            scale = max(float(np.abs(bb).max()), 1e-9)
            rel = float(np.abs(a - bb).max()) / scale
            print(f"[{tag}] grad[{name}] max rel diff = {rel:.3e}")
            good = good and rel < tol_grad
        return good

    ok = compare("interpret", l_i, img_i, g_i, 5e-4, 5e-3)

    # independent third path: the pure-XLA rasterizer backend (different
    # compositing code entirely) — guards against both pallas paths
    # accidentally sharing an executable
    cfg_x = dataclasses_replace_backend(cfg, "xla")

    def loss_x(m, c, o, s, r):
        out = rasterize(m, c, o, s, r, view_matrix=jnp.asarray(cam.world_view),
                        proj_matrix=jnp.asarray(cam.full_proj),
                        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
                        width=width, height=height, bg_color=jnp.zeros(3),
                        config=cfg_x)
        return jnp.sum((out.color - tgt) ** 2), out.color

    grad_fn3 = jax.jit(jax.value_and_grad(loss_x, argnums=(0, 1, 2, 3, 4), has_aux=True))
    (l_x, img_x), g_x = jax.tree.map(np.asarray, grad_fn3(means, cols, ops_, scales, rots))
    ok = compare("xla-backend", l_x, img_x, g_x, 2e-3, 2e-2) and ok

    print("raster compiled-vs-interpret+xla:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def dataclasses_replace_backend(cfg, backend):
    import dataclasses

    return dataclasses.replace(cfg, backend=backend)


if __name__ == "__main__":
    sys.exit(main())
