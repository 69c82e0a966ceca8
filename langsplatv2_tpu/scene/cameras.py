"""Camera objects.

Parity target: reference `scene/cameras.py` — the transposed world-view /
full-projection matrices (row-vector convention the rasterizer consumes),
camera center from the inverse view transform, and `get_language_feature`'s
per-pixel gather of preprocessed CLIP features from `<image>_{s,f}.npy`.
Cameras are host-side objects; arrays go to device at render/train time.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np

from ..utils import camera_math as cm

ZNEAR = 0.01
ZFAR = 100.0


@dataclass
class Camera:
    colmap_id: int
    R: np.ndarray            # [3,3] cam-to-world rotation (COLMAP qvec^T)
    T: np.ndarray            # [3] world-to-cam translation
    FoVx: float
    FoVy: float
    image: np.ndarray | None  # [3, H, W] float32 in [0,1] (premultiplied by alpha mask)
    image_name: str
    uid: int
    image_width: int = 0
    image_height: int = 0
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0
    znear: float = ZNEAR
    zfar: float = ZFAR

    # Derived (filled in __post_init__).
    world_view_transform: np.ndarray = field(init=False)
    projection_matrix: np.ndarray = field(init=False)
    full_proj_transform: np.ndarray = field(init=False)
    camera_center: np.ndarray = field(init=False)

    def __post_init__(self):
        if self.image is not None:
            self.image = np.clip(self.image, 0.0, 1.0).astype(np.float32)
            self.image_height, self.image_width = self.image.shape[-2:]
        w2c = cm.get_world_to_view(self.R, self.T, self.trans, self.scale)
        self.world_view_transform = w2c.T.astype(np.float32)
        self.projection_matrix = cm.get_projection_matrix(
            self.znear, self.zfar, self.FoVx, self.FoVy
        ).T.astype(np.float32)
        self.full_proj_transform = (
            self.world_view_transform @ self.projection_matrix
        ).astype(np.float32)
        self.camera_center = np.linalg.inv(self.world_view_transform)[3, :3].astype(np.float32)

    @property
    def tanfovx(self) -> float:
        return math.tan(self.FoVx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.FoVy * 0.5)

    def get_language_feature(self, language_feature_dir: str, feature_level: int):
        """Load the per-pixel CLIP feature map + validity mask for this view
        (reference scene/cameras.py:59-96).

        Returns (features [512, H, W] float32, mask [1, H, W] bool).
        feature_level: 0=default, 1=s, 2=m, 3=l SAM granularity.
        """
        if not 0 <= feature_level <= 3:
            raise ValueError(f"feature_level={feature_level}")
        base = os.path.join(language_feature_dir, self.image_name)

        # Fast path: native mmap loader (langsplatv2_tpu/native) does the
        # resize + gather in C++ threads; falls through to numpy if the
        # library is unavailable.
        from .. import native

        out = native.load_language_feature(
            base + "_s.npy", base + "_f.npy", feature_level,
            self.image_height, self.image_width)
        if out is not None:
            return out

        seg_map = np.load(base + "_s.npy")      # [4, h, w] int, -1 = unassigned
        feature_map = np.load(base + "_f.npy")  # [N_seg, 512]

        H, W = self.image_height, self.image_width
        if seg_map.shape[1] != H or seg_map.shape[2] != W:
            import cv2

            seg_map = np.stack(
                [
                    cv2.resize(seg_map[i], (W, H), interpolation=cv2.INTER_NEAREST)
                    for i in range(seg_map.shape[0])
                ]
            )
        seg = seg_map[feature_level].astype(np.int64)  # [H, W]
        mask = seg != -1
        feat = feature_map[seg]                        # [H, W, 512] (row -1 wraps; masked out)
        feat = np.transpose(feat, (2, 0, 1)).astype(np.float32)
        return feat, mask[None]

    def get_language_feature_compact(self, language_feature_dir: str,
                                     feature_level: int):
        """The same ground truth as get_language_feature, in its compact
        on-disk form: (segment feature table [N_seg, 512] f32, per-pixel
        segment index map [H, W] int32, -1 = unassigned).

        The per-pixel 512-d materialization (~1GB at 540x960) is what
        get_language_feature does on host; the compact form is ~400x
        smaller, so the training step can upload it per iteration and do
        the pixel lookup on device — in K-dim Gram space, never in 512-d
        (train/trainer.py gram loss path).
        """
        if not 0 <= feature_level <= 3:
            raise ValueError(f"feature_level={feature_level}")
        base = os.path.join(language_feature_dir, self.image_name)
        seg_map = np.load(base + "_s.npy")      # [4, h, w] int, -1 = unassigned
        feature_map = np.load(base + "_f.npy")  # [N_seg, 512]

        H, W = self.image_height, self.image_width
        if seg_map.shape[1] != H or seg_map.shape[2] != W:
            import cv2

            seg_map = np.stack(
                [
                    cv2.resize(seg_map[i], (W, H), interpolation=cv2.INTER_NEAREST)
                    for i in range(seg_map.shape[0])
                ]
            )
        seg = seg_map[feature_level].astype(np.int32)
        return feature_map.astype(np.float32), seg


@dataclass
class MiniCam:
    """GUI camera: matrices given directly (reference scene/cameras.py:98-110)."""

    image_width: int
    image_height: int
    FoVy: float
    FoVx: float
    znear: float
    zfar: float
    world_view_transform: np.ndarray
    full_proj_transform: np.ndarray
    camera_center: np.ndarray = field(init=False)

    def __post_init__(self):
        self.camera_center = np.linalg.inv(self.world_view_transform)[3, :3]

    @property
    def tanfovx(self) -> float:
        return math.tan(self.FoVx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.FoVy * 0.5)
