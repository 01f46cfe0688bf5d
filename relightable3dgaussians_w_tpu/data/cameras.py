"""Camera container with precomputed rasterization matrices, host-side numpy.

TPU-native equivalent of the reference's `Camera`/`MiniCam` (scene/cameras.py:17-127),
minus the torch module machinery: a plain dataclass of numpy arrays plus a method
producing the traced `CameraMatrices` bundle the rasterizer consumes. Matrices use
math convention (M @ p); the reference stores them transposed for torch `p @ M`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..utils.graphics import world_to_view, projection_matrix, camera_intrinsics
from ..ops.rasterize import CameraMatrices

ZNEAR = 0.01
ZFAR = 100.0


@dataclass
class Camera:
    uid: int
    colmap_id: int
    R: np.ndarray                 # [3, 3] world-from-cam rotation (COLMAP R^T)
    T: np.ndarray                 # [3] cam-from-world translation
    fovx: float
    fovy: float
    image_name: str
    image: np.ndarray | None      # [H, W, 3] float32 in [0, 1]
    sky_mask: np.ndarray | None   # [H, W] float32, 1 = not sky
    occluders_mask: np.ndarray | None  # [H, W] float32, 1 = keep
    width: int
    height: int
    cx: float | None = None
    cy: float | None = None
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0

    def __post_init__(self):
        self.world_view = world_to_view(self.R, self.T, self.trans, self.scale)
        self.proj = projection_matrix(ZNEAR, ZFAR, self.fovx, self.fovy)
        self.full_proj = (self.proj @ self.world_view).astype(np.float32)
        self.c2w = np.linalg.inv(self.world_view).astype(np.float32)
        self.camera_center = self.c2w[:3, 3]

    @property
    def tan_fovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tan_fovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    def matrices(self) -> CameraMatrices:
        return CameraMatrices(
            viewmat=self.world_view,
            projmat=self.full_proj,
            campos=self.camera_center,
            tan_fovx=np.float32(self.tan_fovx),
            tan_fovy=np.float32(self.tan_fovy),
        )

    def intrinsics(self) -> np.ndarray:
        return camera_intrinsics(self.fovx, self.fovy, self.width, self.height)

    def project(self, xyz: np.ndarray) -> np.ndarray:
        """Project world points to pixel coordinates; NaN for points behind the
        camera. Used by sky-Gaussian seeding (gaussian_model.py:210-230). NOTE: the
        reference's Camera.project (cameras.py:99-114) scales by FoV *angles* instead
        of focal lengths and maps behind-camera points to the principal point; we use
        a proper pinhole projection."""
        cam = xyz @ self.world_view[:3, :3].T + self.world_view[:3, 3]
        z = cam[:, 2:3]
        K = self.intrinsics()
        with np.errstate(divide="ignore", invalid="ignore"):
            uv = np.where(z > 1e-6, cam[:, :2] / z, np.nan)
        u = K[0, 0] * uv[:, 0] + K[0, 2]
        v = K[1, 1] * uv[:, 1] + K[1, 2]
        return np.stack([u, v], axis=-1)


def scene_center(cameras: list[Camera]) -> np.ndarray:
    """Mean camera center (utils/camera_utils.py:97-105)."""
    centers = np.stack([c.camera_center for c in cameras], axis=0)
    return centers.mean(axis=0)


def nerfpp_norm(cameras: list[Camera]) -> dict:
    """Scene radius = 1.1 * max distance from mean camera center
    (dataset_readers.py:53-74)."""
    centers = np.stack([c.camera_center for c in cameras], axis=0)
    avg = centers.mean(axis=0, keepdims=True)
    diagonal = np.linalg.norm(centers - avg, axis=1).max()
    return {"translate": -avg[0], "radius": diagonal * 1.1}


def camera_to_json(cam_id: int, cam: Camera) -> dict:
    """SIBR-viewer camera entry (camera_utils.py:74-94): camera-to-world
    position/rotation + focal lengths, written to <model_path>/cameras.json."""
    from ..utils.graphics import fov2focal

    Rt = np.zeros((4, 4))
    Rt[:3, :3] = cam.R.transpose()
    Rt[:3, 3] = cam.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    return {
        "id": cam_id,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": W2C[:3, 3].tolist(),
        "rotation": [row.tolist() for row in W2C[:3, :3]],
        "fy": fov2focal(cam.fovy, cam.height),
        "fx": fov2focal(cam.fovx, cam.width),
    }
