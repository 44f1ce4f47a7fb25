"""NeRF-synthetic (Blender) dataset: transforms_{split}.json + PNG frames.

Reference semantics: threedgrut/datasets/dataset_nerf.py — fov->focal,
camera-to-world pose convention flip c2w[:, 1:3] *= -1 (right-up-back ->
right-down-front, dataset_nerf.py:150), white-background alpha compositing of
RGBA frames, optional `*_mask.png`, scene extent = 1.1 * camera-bbox diagonal.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from threedgrut_tpu.cameras import PinholeCamera
from threedgrut_tpu.datasets.protocols import View, camera_bbox_extent


_LOADER = None


def _load_image(path: str) -> np.ndarray:
    """Decode via the native C++ threaded loader (PIL fallback inside)."""
    global _LOADER
    if _LOADER is None:
        from threedgrut_tpu.datasets.native_loader import ImageLoader
        _LOADER = ImageLoader(n_threads=8)
    img = _LOADER.get(path)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    return img


class NeRFDataset:
    def __init__(self, path: str, split: str = "train",
                 downsample_factor: int = 1,
                 bg_color: Optional[np.ndarray] = None,
                 shutter_type: str = "global"):
        from threedgrut_tpu.datasets.protocols import parse_shutter
        self.path = path
        self.split = split
        self.shutter = parse_shutter(shutter_type)
        with open(os.path.join(path, f"transforms_{split}.json")) as f:
            meta = json.load(f)
        self.camera_angle_x = float(meta["camera_angle_x"])
        self.frames = meta["frames"]
        self.downsample = downsample_factor
        self.bg_color = (np.ones(3, np.float32) if bg_color is None
                         else np.asarray(bg_color, np.float32))
        self._views: List[Optional[View]] = [None] * len(self.frames)
        self._poses = np.stack([
            self._pose(np.asarray(fr["transform_matrix"], np.float32))
            for fr in self.frames])
        self._extent = camera_bbox_extent(self._poses[:, :3, 3])

    @staticmethod
    def _pose(c2w: np.ndarray) -> np.ndarray:
        out = c2w.copy()
        out[:3, 1:3] *= -1.0  # right-up-back -> right-down-front
        return out

    def __len__(self) -> int:
        return len(self.frames)

    @property
    def scene_extent(self) -> float:
        return self._extent

    @property
    def observer_points(self) -> np.ndarray:
        return self._poses[:, :3, 3]

    def _frame_path(self, fr) -> str:
        p = os.path.join(self.path, fr["file_path"])
        if not os.path.splitext(p)[1]:
            p += ".png"
        return p

    def __getitem__(self, idx: int) -> View:
        if self._views[idx] is not None:
            return self._views[idx]
        fr = self.frames[idx]
        img = _load_image(self._frame_path(fr))
        if self.downsample > 1:
            img = img[::self.downsample, ::self.downsample]
        if img.shape[-1] == 4:
            alpha = img[..., 3:4]
            img = img[..., :3] * alpha + self.bg_color * (1.0 - alpha)
        h, w = img.shape[:2]
        focal = 0.5 * w / np.tan(0.5 * self.camera_angle_x)
        cam = PinholeCamera(
            focal=np.array([focal, focal], np.float32),
            principal=np.array([w / 2.0, h / 2.0], np.float32),
            radial=np.zeros(6, np.float32),
            tangential=np.zeros(2, np.float32),
            thin_prism=np.zeros(4, np.float32),
        )
        mask = None
        mask_path = self._frame_path(fr).replace(".png", "_mask.png")
        if os.path.exists(mask_path):
            m = _load_image(mask_path)
            if m.ndim == 3:
                m = m[..., 0]
            mask = m[..., None].astype(np.float32)
        from threedgrut_tpu.datasets.protocols import apply_shutter
        view = apply_shutter(
            View(T_to_world=self._poses[idx], camera=cam,
                 resolution=(w, h), rgb_gt=img.astype(np.float32),
                 mask=mask), self.shutter)
        self._views[idx] = view
        return view
