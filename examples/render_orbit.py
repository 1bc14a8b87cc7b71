"""Turntable video of a trained background splat (or any PLY).

Usage:
  python examples/render_orbit.py --ply out/bg/point_cloud/iteration_30000/point_cloud.ply \
      --out orbit.avi [--frames 60 --radius 2.5 --width 960 --height 544]

Loads the PLY with core.ply, orbits a camera around the splat centroid, and
packs the renders with utils.video_io (MJPEG-AVI without ffmpeg)."""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.core.ply import load_background_ply
from fluidnexus_tpu.data.camera_paths import orbit_cameras
from fluidnexus_tpu.ops.rasterizer import RasterizerConfig, rasterize
from fluidnexus_tpu.utils.video_io import write_video


def main(argv=None):
    ap = argparse.ArgumentParser(description="orbit-render a splat PLY to video")
    ap.add_argument("--ply", required=True)
    ap.add_argument("--out", default="orbit.avi")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--radius", type=float, default=2.5)
    ap.add_argument("--elevation", type=float, default=0.3)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--fps", type=int, default=12)
    ap.add_argument("--white_background", action="store_true")
    args = ap.parse_args(argv)

    d = load_background_ply(args.ply)
    xyz = jnp.asarray(d["xyz"])
    color = jnp.asarray(d["color"])
    opacity = jnp.asarray(1.0 / (1.0 + np.exp(-d["opacity"]))).reshape(-1)
    scales = jnp.asarray(np.exp(d["scaling"]))
    rot = d["rotation"]
    rot = jnp.asarray(rot / (np.linalg.norm(rot, axis=-1, keepdims=True) + 1e-12))

    center = np.asarray(xyz).mean(0)
    spread = float(np.percentile(np.linalg.norm(np.asarray(xyz) - center, axis=1), 90))
    cams = orbit_cameras(center, radius=max(args.radius, 1.5 * spread),
                         n_frames=args.frames, height=args.elevation,
                         width=args.width, image_height=args.height)

    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
    cfg = RasterizerConfig(backend="auto")
    frames = []
    for i, cam in enumerate(cams):
        out = rasterize(
            xyz, color, opacity, scales, rot,
            view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            width=cam.width, height=cam.height, bg_color=bg, config=cfg,
        )
        frames.append(np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1))
        if (i + 1) % 10 == 0:
            print(f"{i + 1}/{len(cams)} frames")
    path = write_video(args.out, np.stack(frames), fps=args.fps)
    print("wrote", path)


if __name__ == "__main__":
    main()
