"""Math utilities shared across the framework.

Behavioral parity targets (see reference, cited per-function):
quaternion->rotation, scaling-rotation composition, symmetric-matrix packing,
log-lerp LR schedule, sigmoid family.
Reference: FluidDynamics/utils/general_utils.py, graphics_utils.py.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def inv_sigmoid(x):
    """Inverse of the logistic sigmoid (ref: general_utils.py:9)."""
    return jnp.log(x / (1.0 - x))


def quat_to_rotmat(q):
    """Unit-quaternion (w,x,y,z) -> 3x3 rotation matrices, batched.

    Mirrors FluidDynamics/utils/general_utils.py:113 (build_rotation) except
    normalization is the caller's job (the reference normalizes in the
    activation; the CUDA kernel uses raw values).
    q: (..., 4) -> (..., 3, 3)
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


def normalize(v, axis=-1, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def build_scaling_rotation(s, q):
    """L = R @ diag(s), batched (ref: general_utils.py:182)."""
    R = quat_to_rotmat(normalize(q))
    return R * s[..., None, :]


def covariance_from_scaling_rotation(scaling, scaling_modifier, rotation):
    """World-space 3D covariance Sigma = L L^T with L = R diag(mod*s).

    Matches the CUDA computeCov3D semantics (forward.cu:116-149): the kernel
    builds M = S R (row-major glm => effectively (R diag(s))^T) and returns
    M^T M = R diag(s)^2 R^T.
    Returns full (..., 3, 3) symmetric matrices.
    """
    import jax

    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    return jnp.matmul(L, jnp.swapaxes(L, -1, -2), precision=jax.lax.Precision.HIGHEST)


def strip_symmetric(cov):
    """Pack (...,3,3) symmetric -> (...,6) upper triangle [xx,xy,xz,yy,yz,zz]."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2], cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], -1
    )


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000):
    """Log-linearly interpolated LR schedule (ref: general_utils.py:63).

    Returns 0 when step < 0 or both lrs are 0. Works on python ints or arrays.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return 0.0
    t = np.clip(np.asarray(step, np.float64) / max_steps, 0.0, 1.0)
    log_lerp = np.exp(np.log(max(lr_init, 1e-32)) * (1 - t) + np.log(max(lr_final, 1e-32)) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
            0.5 * np.pi * np.clip(np.asarray(step, np.float64) / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    out = delay_rate * log_lerp
    return float(out) if np.ndim(out) == 0 else out


def fov2focal(fov, pixels):
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


def get_world_to_view(R, t, translate=np.array([0.0, 0.0, 0.0]), scale=1.0):
    """World->camera 4x4 (ref: graphics_utils.py:101 get_world_2_view2).

    R is cam->world rotation (stored transposed by convention), t is w2c
    translation. Returns the classic 3DGS Rt with optional recentering.
    """
    Rt = np.zeros((4, 4), dtype=np.float32)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = C2W[:3, 3]
    cam_center = (cam_center + translate) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def get_projection_matrix(znear, zfar, fovx, fovy):
    """OpenGL-style perspective matrix used by 3DGS (ref: graphics_utils.py:38)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def get_projection_matrix_cv(znear, zfar, fovx, fovy, cx=0.0, cy=0.0):
    """Perspective matrix with principal-point offset (ref: graphics_utils.py:66)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    # principal-point shift moves the frustum window
    cx_shift = cx * (right - left) / 2
    cy_shift = cy * (top - bottom) / 2
    left += cx_shift
    right += cx_shift
    top += cy_shift
    bottom += cy_shift
    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P
