"""Camera model.

Matches the reference convention (FluidDynamics/scene/camera.py:14-143):
``world_view`` is the world->camera matrix stored TRANSPOSED so points
transform as row-vectors ``p @ M``; ``full_proj = world_view @ projection``;
``camera_center = inv(world_view)[3, :3]``. znear=0.01, zfar=100.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.utils.maths import get_projection_matrix, get_projection_matrix_cv, get_world_to_view


@dataclasses.dataclass
class Camera:
    """A single view. Numpy-backed; convert to device arrays at render time."""

    uid: int
    R: np.ndarray            # (3,3) cam->world rotation (3DGS convention)
    T: np.ndarray            # (3,)  w2c translation
    fovx: float
    fovy: float
    width: int
    height: int
    image: Optional[np.ndarray] = None        # (H,W,C) float32 in [0,1]; supervision target
    image_real: Optional[np.ndarray] = None   # real capture when image is a generated fake view
    image_name: str = ""
    time_idx: int = 0
    timestamp: float = 0.0
    is_fake_view: bool = False
    cxr: float = 0.0
    cyr: float = 0.0
    znear: float = 0.01
    zfar: float = 100.0

    def __post_init__(self):
        w2v = get_world_to_view(self.R, self.T)
        self.world_view = w2v.T.astype(np.float32)  # row-vector convention
        if self.cyr != 0.0:
            proj = get_projection_matrix_cv(self.znear, self.zfar, self.fovx, self.fovy, self.cxr, self.cyr).T
        else:
            proj = get_projection_matrix(self.znear, self.zfar, self.fovx, self.fovy).T
        self.projection = proj.astype(np.float32)
        self.full_proj = (self.world_view @ self.projection).astype(np.float32)
        self.camera_center = np.linalg.inv(self.world_view)[3, :3].astype(np.float32)

    @property
    def tan_fovx(self) -> float:
        return float(np.tan(self.fovx * 0.5))

    @property
    def tan_fovy(self) -> float:
        return float(np.tan(self.fovy * 0.5))

    def raster_inputs(self):
        """Device-ready dict of the static per-view rasterizer inputs."""
        return dict(
            view_matrix=jnp.asarray(self.world_view),
            proj_matrix=jnp.asarray(self.full_proj),
            campos=jnp.asarray(self.camera_center),
            tan_fovx=self.tan_fovx,
            tan_fovy=self.tan_fovy,
            width=self.width,
            height=self.height,
        )
