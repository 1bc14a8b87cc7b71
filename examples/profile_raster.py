"""Profile the bench rasterizer workload on the TPU chip.

Dumps an XLA profiler trace (xplane) of N fwd+bwd steps and prints a
per-op-category cost table extracted from the xplane proto, so kernel work
can be targeted without opening TensorBoard. Usage:

  PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_raster.py [outdir]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/raster_profile"

    from fluidnexus_tpu.data.cameras import Camera
    from fluidnexus_tpu.ops import RasterizerConfig, rasterize

    rng = np.random.default_rng(0)
    n = 32768
    width, height = 960, 544
    R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
    T = -R.T @ np.array([0.0, 0.0, 3.0])
    cam = Camera(uid=0, R=R, T=T, fovx=0.9, fovy=0.6, width=width, height=height)

    means = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    ops_ = jnp.asarray(rng.uniform(0.05, 0.9, (n,)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-5.0, -3.2, (n, 3))), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    target = jnp.zeros((3, height, width), jnp.float32)

    cfg = RasterizerConfig(tile_x=32, tile_y=32, tile_capacity=384, chunk=32,
                           dup_x=3, dup_y=3, backend="pallas")
    rkw = dict(view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
               tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, width=width, height=height,
               bg_color=jnp.zeros(3), config=cfg)

    def loss(means, cols, ops_, scales, rots):
        return jnp.abs(rasterize(means, cols, ops_, scales, rots, **rkw).color - target).mean()

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    g = step(means, cols, ops_, scales, rots)
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    with jax.profiler.trace(out):
        for _ in range(20):
            g = step(means, cols, ops_, scales, rots)
        jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / 20
    print(f"mean step {dt*1e3:.2f} ms = {1/dt:.1f} fps; trace -> {out}")

    summarize(out)


def summarize(out):
    """Parse the xplane proto: top ops by self time on the device plane."""
    import glob
    import gzip

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa

    files = sorted(glob.glob(out + "/plugins/profile/*/*.xplane.pb"))
    if not files:
        print("no xplane found")
        return
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        evs = {}
        for line in plane.lines:
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                evs[md.name] = evs.get(md.name, 0) + ev.duration_ps / 1e9  # ms total
        print(f"== plane: {plane.name}")
        for name, ms in sorted(evs.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {ms/20:8.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
