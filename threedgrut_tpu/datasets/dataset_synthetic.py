"""Procedural in-memory dataset for tests and benchmarks (no files needed).

Generates a ground-truth scene of random Gaussians, renders gt images with the
naive oracle renderer, and serves them as training views. This plays the role
of the reference's CPU-runnable PR1 config (lego 400x400) when no dataset is
on disk: end-to-end training against it must recover the scene (PSNR rises),
which exercises the full renderer/loss/optimizer stack.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from threedgrut_tpu.cameras import PinholeCamera, pose_from_matrix
from threedgrut_tpu.datasets.protocols import View, camera_bbox_extent
from threedgrut_tpu.render import gut_reference


def look_at(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Camera-to-world with right-down-front (OpenCV) axes."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, eye
    return T


def orbit_poses(n: int, radius: float = 4.0, height: float = 1.5,
                target=(0.0, 0.0, 0.0)) -> List[np.ndarray]:
    tgt = np.asarray(target, np.float32)
    poses = []
    for i in range(n):
        a = 2.0 * np.pi * i / n
        eye = np.array([radius * np.cos(a), radius * np.sin(a), height],
                       np.float32)
        poses.append(look_at(eye, tgt, np.array([0.0, 0.0, 1.0], np.float32)))
    return poses


def random_gt_scene(n: int, seed: int = 0, extent: float = 1.0):
    """Ground-truth particles: positions in a ball, random colors/shapes."""
    rng = np.random.default_rng(seed)
    pos = rng.normal(0, extent / 2.0, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.12),
                                size=(n, 3))).astype(np.float32) * extent
    opac = rng.uniform(0.4, 0.95, size=(n,)).astype(np.float32)
    k = 16  # SH degree 3
    feats = np.zeros((n, k, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.2, 1.2, size=(n, 3))
    feats[:, 1:] = rng.normal(0, 0.05, size=(n, k - 1, 3))
    return pos, quats, scales, opac, feats


class SyntheticDataset:
    """`multi_sensor=True` builds the BASELINE config-4-class acceptance
    scene (VERDICT r4 #7): a rig of alternating pinhole / fisheye sensors,
    rolling shutter (top-to-bottom, with a real end pose advanced along the
    orbit) on half the views, and circular vignette masks on the fisheye
    views — every long-tail camera feature through one procedural dataset.
    GT images are rendered by the oracle under the SAME camera model,
    shutter pose pair, and mask the trainer will see."""

    def __init__(self, num_views: int = 12, resolution: Tuple[int, int] = (64, 64),
                 num_gt_gaussians: int = 96, seed: int = 0,
                 sh_degree: int = 3, multi_sensor: bool = False):
        from threedgrut_tpu.cameras import (FisheyeCamera, SensorPose,
                                            ShutterType)
        self.resolution = resolution
        self.scene = random_gt_scene(num_gt_gaussians, seed)
        w, h = resolution
        f = 0.9 * w
        self.camera = PinholeCamera(
            focal=np.array([f, f], np.float32),
            principal=np.array([w / 2.0, h / 2.0], np.float32),
            radial=np.zeros(6, np.float32),
            tangential=np.zeros(2, np.float32),
            thin_prism=np.zeros(4, np.float32),
        )
        fisheye = FisheyeCamera(
            focal=np.array([0.55 * w, 0.55 * w], np.float32),
            principal=np.array([w / 2.0, h / 2.0], np.float32),
            radial=np.array([0.03, 0.005, 0.0, 0.0], np.float32),
            max_angle=np.float32(1.2))
        self._poses = orbit_poses(num_views)
        # Rolling-shutter end poses: the camera keeps moving along the
        # orbit during the exposure (~15% of the inter-view step).
        poses_end = orbit_poses(num_views, radius=4.0, height=1.5)
        ang = 2.0 * np.pi * 0.15 / num_views
        rot = np.array([[np.cos(ang), -np.sin(ang), 0.0],
                        [np.sin(ang), np.cos(ang), 0.0],
                        [0.0, 0.0, 1.0]], np.float32)
        for i, T in enumerate(self._poses):
            Te = T.copy()
            Te[:3, 3] = rot @ T[:3, 3]
            Te[:3, :3] = rot @ T[:3, :3]
            poses_end[i] = Te

        pos, quats, scales, opac, feats = [jnp.asarray(x) for x in self.scene]
        import jax
        # One jitted render per (camera-kind, shutter) pair, reused across
        # views (everything passed as arguments — eager/const-folded
        # execution is unusably slow through remote-TPU tunnels). On TPU
        # (and at production resolutions) the FAST renderer generates GT —
        # same semantics as the oracle (tests pin the equivalence); the
        # O(N*pixels) oracle stays the CPU/test default.
        use_fast = (jax.default_backend() == "tpu"
                    or resolution[0] * resolution[1] > 256 * 256)
        gt_cap = max(1 << 16, min(1 << 22, 64 * num_gt_gaussians))
        gt_cap = -(-gt_cap // 256) * 256
        render_fns = {}

        def gt_render(cam, shutter, T, T_end):
            k = (type(cam).__name__, int(shutter))
            if k not in render_fns:
                def fn(T, T_end, cam, *scene, shutter=shutter):
                    p0 = pose_from_matrix(T)
                    p1 = pose_from_matrix(T_end)
                    pose = SensorPose(q_start=p0.q_start, t_start=p0.t_start,
                                      q_end=p1.q_start, t_end=p1.t_start)
                    if use_fast:
                        from threedgrut_tpu.render import gut
                        out, ovf = gut.render(
                            *scene, cam, pose, resolution, gt_cap,
                            shutter=ShutterType(shutter),
                            sh_degree=sh_degree, aux_gradients=False)
                        return out.rgb, ovf
                    out = gut_reference.render(
                        *scene, cam, pose, resolution,
                        shutter=ShutterType(shutter), sh_degree=sh_degree)
                    return out.rgb, jnp.bool_(False)
                render_fns[k] = jax.jit(fn)
            rgb, ovf = render_fns[k](jnp.asarray(T), jnp.asarray(T_end), cam,
                                     pos, quats, scales, opac, feats)
            assert not bool(ovf), "synthetic GT render overflowed gt_cap"
            return rgb

        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        vignette = ((xx - w / 2.0) ** 2 + (yy - h / 2.0) ** 2
                    <= (0.62 * min(w, h)) ** 2).astype(np.float32)[..., None]

        self._views = []
        for i, T in enumerate(self._poses):
            if multi_sensor:
                cam = fisheye if i % 2 == 1 else self.camera
                shutter = (ShutterType.ROLLING_TOP_TO_BOTTOM
                           if i % 4 >= 2 else ShutterType.GLOBAL)
                pose_end = (poses_end[i]
                            if shutter != ShutterType.GLOBAL else None)
                mask = vignette if i % 2 == 1 else None
            else:
                cam, shutter, pose_end, mask = (self.camera,
                                                ShutterType.GLOBAL, None,
                                                None)
            cam_np = jax.tree.map(jnp.asarray, cam)
            rgb = np.clip(np.asarray(gt_render(
                cam_np, shutter, T,
                pose_end if pose_end is not None else T)), 0.0, 1.0)
            self._views.append(View(
                T_to_world=T, camera=cam, resolution=resolution,
                rgb_gt=rgb.astype(np.float32), mask=mask,
                shutter=shutter, pose_end=pose_end))
        self._extent = camera_bbox_extent(
            np.stack([T[:3, 3] for T in self._poses]))

    def __len__(self):
        return len(self._views)

    def __getitem__(self, idx: int) -> View:
        return self._views[idx]

    @property
    def scene_extent(self) -> float:
        return self._extent

    @property
    def observer_points(self) -> np.ndarray:
        return np.stack([T[:3, 3] for T in self._poses])
