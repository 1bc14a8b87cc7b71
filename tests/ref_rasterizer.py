"""Tiny numpy per-pixel reference rasterizer used as the golden oracle.

Implements the exact compositing semantics documented in
fluidnexus_tpu/ops/rasterizer.py (which mirror the reference CUDA kernel,
forward.cu:250-373) with a naive O(N * pixels) loop — no tiling, no capacity
limits — so tile/capacity logic in the real kernel is what the tests check.
"""
import numpy as np


def quat_to_rot(q):
    r, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def rasterize_ref(
    means3d, colors, opacities, scales, rotations,
    view_matrix, proj_matrix, tan_fovx, tan_fovy, width, height, bg,
    early_stop_semantics="mask", tile=16,
):
    n = means3d.shape[0]
    c = colors.shape[-1]
    focal_x = width / (2 * tan_fovx)
    focal_y = height / (2 * tan_fovy)

    pre = []
    for i in range(n):
        p = means3d[i]
        p_view = np.append(p, 1.0) @ view_matrix
        if p_view[2] <= 0.2:
            continue
        p_hom = np.append(p, 1.0) @ proj_matrix
        p_proj = p_hom[:3] / (p_hom[3] + 1e-7)

        q = rotations[i] / np.linalg.norm(rotations[i])
        R = quat_to_rot(q)
        L = R @ np.diag(scales[i])
        cov3d = L @ L.T

        tz = p_view[2]
        limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
        tx = np.clip(p_view[0] / tz, -limx, limx) * tz
        ty = np.clip(p_view[1] / tz, -limy, limy) * tz
        J = np.array(
            [[focal_x / tz, 0, -focal_x * tx / tz**2], [0, focal_y / tz, -focal_y * ty / tz**2]]
        )
        W = view_matrix[:3, :3].T
        cov2d = J @ W @ cov3d @ W.T @ J.T
        cov2d[0, 0] += 0.3
        cov2d[1, 1] += 0.3
        det = np.linalg.det(cov2d)
        if det == 0:
            continue
        conic = np.array([cov2d[1, 1], -cov2d[0, 1], cov2d[0, 0]]) / det
        mid = 0.5 * (cov2d[0, 0] + cov2d[1, 1])
        lam1 = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3 * np.sqrt(lam1))
        if radius <= 0:
            continue
        px = ((p_proj[0] + 1) * width - 1) * 0.5
        py = ((p_proj[1] + 1) * height - 1) * 0.5
        # tile rect culling, as in getRect (auxiliary.h:43) — a Gaussian only
        # contributes to pixels in tiles its radius-rect touches
        tiles_x = -(-width // tile)
        tiles_y = -(-height // tile)
        xmin = min(tiles_x, max(0, int((px - radius) / tile)))
        xmax = min(tiles_x, max(0, int((px + radius + tile - 1) / tile)))
        ymin = min(tiles_y, max(0, int((py - radius) / tile)))
        ymax = min(tiles_y, max(0, int((py + radius + tile - 1) / tile)))
        pre.append((p_view[2], px, py, conic, opacities[i], colors[i], (xmin, xmax, ymin, ymax)))

    pre.sort(key=lambda t: t[0])

    out = np.zeros((height, width, c))
    out_depth = np.full((height, width), 15.0)
    out_t = np.ones((height, width))
    for yy in range(height):
        for xx in range(width):
            T = 1.0
            acc = np.zeros(c)
            med = 15.0
            for dep, px, py, conic, op, col, rect in pre:
                if not (rect[0] <= xx // tile < rect[1] and rect[2] <= yy // tile < rect[3]):
                    continue
                dx, dy = px - xx, py - yy
                power = -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) - conic[1] * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, op * np.exp(power))
                if alpha < 1 / 255:
                    continue
                test_t = T * (1 - alpha)
                if early_stop_semantics == "freeze" and test_t < 1e-4:
                    break
                if early_stop_semantics == "mask" and T < 1e-4:
                    continue
                acc += col * alpha * T
                if T > 0.5 and test_t < 0.5:
                    med = dep
                T = test_t
            out[yy, xx] = acc + T * np.asarray(bg)
            out_depth[yy, xx] = med
            out_t[yy, xx] = T
    return out.transpose(2, 0, 1), out_depth, out_t
