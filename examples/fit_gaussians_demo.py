"""End-to-end smoke demo: differentiable 3DGS fit + PBF rollout on the
current JAX backend (TPU when available).

Drives the framework through its public API only:
  1. renders a target image from a "ground-truth" Gaussian scene,
  2. recovers perturbed Gaussian parameters by gradient descent through the
     tile rasterizer (the core loop of pipelines/train_background),
  3. runs an emit -> guess -> solve -> confirm -> advect PBF sequence (the
     core loop of pipelines/train_physical_particle phase B/C).

Prints PSNR trajectory and solver diagnostics.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fluidnexus_tpu.data.cameras import Camera
from fluidnexus_tpu.ops import RasterizerConfig, rasterize
from fluidnexus_tpu.sim import PBFParams, make_particle_state
from fluidnexus_tpu.sim.pbf import confirm_guess, guess_hidden, solver_loop, update_visual
from fluidnexus_tpu.sim.state import make_visual_state
from fluidnexus_tpu.utils.losses import psnr, ssim

print("backend:", jax.default_backend(), jax.devices())

# ---------------------------------------------------------------- rasterizer
R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
T = -R.T @ np.array([0.0, 0.0, 3.0])
cam = Camera(uid=0, R=R, T=T, fovx=0.8, fovy=0.6, width=128, height=96)

rng = np.random.default_rng(0)
N = 256
gt = dict(
    means=jnp.asarray(rng.uniform(-0.7, 0.7, (N, 3)), jnp.float32),
    cols=jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32),
    ops=jnp.asarray(rng.uniform(0.4, 0.9, (N,)), jnp.float32),
    scales=jnp.asarray(np.exp(rng.uniform(-3.2, -2.2, (N, 3))), jnp.float32),
    rots=jnp.asarray(rng.normal(size=(N, 4)), jnp.float32),
)
cfg = RasterizerConfig(tile_capacity=128, chunk=32)
rkw = dict(
    view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
    tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, width=cam.width, height=cam.height,
    bg_color=jnp.zeros(3), config=cfg,
)
target = rasterize(gt["means"], gt["cols"], gt["ops"], gt["scales"], gt["rots"], **rkw).color

params = dict(
    means=gt["means"] + 0.03 * jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
    cols=jnp.clip(gt["cols"] + 0.2 * jnp.asarray(rng.normal(size=(N, 3)), jnp.float32), 0, 1),
)


def loss_fn(p):
    out = rasterize(p["means"], p["cols"], gt["ops"], gt["scales"], gt["rots"], **rkw)
    return 0.8 * jnp.abs(out.color - target).mean() + 0.2 * (1 - ssim(out.color, target)), out.color


opt = optax.adam(2e-3)
opt_state = opt.init(params)


@jax.jit
def step(p, s):
    (l, img), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    updates, s = opt.update(g, s)
    return optax.apply_updates(p, updates), s, l, img


t0 = time.time()
img0 = rasterize(params["means"], params["cols"], gt["ops"], gt["scales"], gt["rots"], **rkw).color
print(f"initial PSNR {float(psnr(img0, target)):.2f} dB")
for i in range(201):
    params, opt_state, l, img = step(params, opt_state)
    if i % 50 == 0:
        print(f"iter {i:4d} loss {float(l):.5f} PSNR {float(psnr(img, target)):.2f} dB")
jax.block_until_ready(img)
print(f"fit wall time {time.time()-t0:.1f}s; final PSNR {float(psnr(img, target)):.2f} dB")

# ---------------------------------------------------------------- PBF
# reference smoke regime (configs/fluid_nexus_smoke_dynamics.json): H=2.0 in
# scaled (x100) space, particle spacing 0.9, p0=1.5, k=3, secs=0.033
p = PBFParams(h=2.0, p0=1.5, k=3.0, secs=0.033, alpha=0.0, knn_k=64)
grid = np.stack(np.meshgrid(*[np.arange(8) * 0.9] * 3, indexing="ij"), -1).reshape(-1, 3)
st = make_particle_state(1024, jnp.asarray(grid.astype(np.float32)), init_velocity_y=100.0)
vis = make_visual_state(256, jnp.asarray(grid[::4] + 0.45, jnp.float32))

for tick in range(5):
    st = guess_hidden(st, p)
    st, diags = solver_loop(st, p, iterations=10)
    st = confirm_guess(st, p)
    vis = update_visual(vis, st, p)
    print(
        f"tick {tick}: rho/rho0 {float(diags['p_ratio'][-1]):.3f} "
        f"mean|v| {float(jnp.abs(st.velocity).mean()):.3f} "
        f"alive {int(st.num_alive)} vis_y_mean {float(vis.xyz[vis.alive].mean(0)[1]):.3f}"
    )
print("demo OK")
