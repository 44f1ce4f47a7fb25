"""Dataset protocol: the per-view batch and the bounded multi-view interface.

Reference semantics: threedgrut/datasets/protocols.py:23-98 — Batch carries
camera-space rays, a camera-to-world transform, ground truth, and intrinsics;
datasets expose scene bounds/extent and observer (camera) points for model
init. TPU-native difference: rays are generated on device from the camera
model inside the jitted render (no cached ray grids or H2D ray copies), so a
Batch is just pose + intrinsics + gt.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Protocol, Tuple

import numpy as np

from threedgrut_tpu.cameras import Camera, ShutterType


@dataclasses.dataclass
class View:
    """One training/eval view (host-side, numpy)."""
    T_to_world: np.ndarray          # [4, 4] camera-to-world (right-down-front)
    camera: Camera                  # pinhole or fisheye parameters (numpy ok)
    resolution: Tuple[int, int]     # (W, H)
    rgb_gt: Optional[np.ndarray]    # [H, W, 3] float32 in [0, 1]
    mask: Optional[np.ndarray] = None   # [H, W, 1] float32
    shutter: ShutterType = ShutterType.GLOBAL
    pose_end: Optional[np.ndarray] = None  # [4, 4] for rolling shutter


class MultiViewDataset(Protocol):
    def __len__(self) -> int: ...
    def __getitem__(self, idx: int) -> View: ...
    @property
    def scene_extent(self) -> float: ...
    @property
    def observer_points(self) -> np.ndarray: ...


def parse_shutter(name) -> ShutterType:
    """Config string -> ShutterType ('global', 'rolling_top_to_bottom', ...).

    The reference carries the shutter on the sensor model
    (threedgrut/datasets/camera_models.py:30-44) and the tracer builds the
    start/end pose pair from it (threedgut_tracer/tracer.py:138-151); here
    datasets stamp the same enum onto every View."""
    if isinstance(name, ShutterType):
        return name
    return ShutterType[str(name).strip().upper()]


def parse_shutter_spec(spec):
    """Shutter config -> ShutterType OR {camera_id: ShutterType}.

    Accepts the single-sensor form ('rolling_top_to_bottom'), an explicit
    mapping ({1: 'global', 2: 'rolling_top_to_bottom'}), or the dotted-
    override string form '1:global,2:rolling_top_to_bottom' — per-sensor
    shutter metadata like the reference's per-camera sensor models
    (threedgut_tracer/tracer.py:138-151 builds per-frame pose pairs from
    each sensor's shutter/timestamps)."""
    if isinstance(spec, dict):
        return {int(k): parse_shutter(v) for k, v in spec.items()}
    s = str(spec)
    if ":" in s:
        out = {}
        for part in s.split(","):
            cid, name = part.split(":")
            out[int(cid.strip())] = parse_shutter(name)
        return out
    return parse_shutter(s)


def shutter_for_camera(spec, camera_id: int) -> ShutterType:
    """Resolve a parse_shutter_spec result for one sensor (default GLOBAL
    for camera ids the mapping does not name)."""
    if isinstance(spec, dict):
        return spec.get(int(camera_id), ShutterType.GLOBAL)
    return spec


def apply_shutter(view: View, shutter: ShutterType) -> View:
    """Stamp a shutter model on a view. COLMAP/NeRF formats carry no pose
    timestamps, so start == end pose (the reference does exactly this when
    no timestamps are available, tracer.py:146-151); sensor pipelines with
    real timestamps set `pose_end` themselves."""
    if shutter == ShutterType.GLOBAL:
        return view
    view.shutter = shutter
    if view.pose_end is None:
        view.pose_end = view.T_to_world
    return view


def camera_bbox_extent(camera_centers: np.ndarray,
                       factor: float = 1.1) -> float:
    """Scene extent = factor * camera bounding-box diagonal
    (reference dataset_nerf.py:165-167 / trainer.py:177-182)."""
    lo = camera_centers.min(axis=0)
    hi = camera_centers.max(axis=0)
    return float(np.linalg.norm(hi - lo) * factor)


def epoch_indices(n: int, seed: int, epoch: int) -> np.ndarray:
    rng = np.random.default_rng(seed * 100003 + epoch)
    return rng.permutation(n)


def iterate_epochs(n: int, seed: int) -> Iterator[int]:
    """Infinite shuffled view-index stream (the reference's
    MultiEpochsDataLoader with batch_size=1, datasets/utils.py:138-167)."""
    epoch = 0
    while True:
        for i in epoch_indices(n, seed, epoch):
            yield int(i)
        epoch += 1
