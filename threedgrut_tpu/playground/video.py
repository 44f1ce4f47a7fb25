"""Camera-trajectory video rendering.

Reference: threedgrut_playground/utils (kaolin camera interpolation + video
out). Smooth orbit/keyframe trajectories via Catmull-Rom interpolation of
camera positions; frames rendered with the Engine and written as an MP4
(imageio-ffmpeg) or a PNG sequence fallback.
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np


def catmull_rom(points: np.ndarray, n_samples: int) -> np.ndarray:
    """Closed-loop Catmull-Rom spline through [K, 3] control points."""
    k = len(points)
    out = []
    for i in range(n_samples):
        t = i / n_samples * k
        j = int(np.floor(t)) % k
        u = t - np.floor(t)
        p0, p1, p2, p3 = (points[(j - 1) % k], points[j],
                          points[(j + 1) % k], points[(j + 2) % k])
        out.append(0.5 * ((2 * p1) + (-p0 + p2) * u
                          + (2 * p0 - 5 * p1 + 4 * p2 - p3) * u * u
                          + (-p0 + 3 * p1 - 3 * p2 + p3) * u ** 3))
    return np.asarray(out, np.float32)


def orbit_trajectory(n_frames: int, radius: float = 4.0, height: float = 1.5,
                     target=(0, 0, 0)) -> List[np.ndarray]:
    from threedgrut_tpu.datasets.dataset_synthetic import look_at
    tgt = np.asarray(target, np.float32)
    Ts = []
    for i in range(n_frames):
        a = 2 * np.pi * i / n_frames
        eye = np.array([radius * np.cos(a), radius * np.sin(a), height],
                       np.float32)
        Ts.append(look_at(eye, tgt, np.array([0, 0, 1], np.float32)))
    return Ts


def keyframe_trajectory(keyframes: Sequence[np.ndarray], n_frames: int,
                        target=(0, 0, 0)) -> List[np.ndarray]:
    """Interpolate camera-to-world keyframe positions, look at `target`."""
    from threedgrut_tpu.datasets.dataset_synthetic import look_at
    eyes = catmull_rom(np.asarray([T[:3, 3] for T in keyframes]), n_frames)
    tgt = np.asarray(target, np.float32)
    return [look_at(e, tgt, np.array([0, 0, 1], np.float32)) for e in eyes]


def render_video(engine, cam, trajectory: List[np.ndarray],
                 resolution: Tuple[int, int], out_path: str,
                 fps: int = 30, hybrid: bool = False) -> str:
    """Render the trajectory and write an MP4 (or PNG sequence fallback).

    Returns the path actually written."""
    import jax.numpy as jnp
    frames = []
    render = engine.render_hybrid if hybrid else engine.render
    for T in trajectory:
        out = render(cam, jnp.asarray(T), resolution)
        frames.append((np.clip(np.asarray(out["rgb"]), 0, 1)
                       * 255).astype(np.uint8))
    try:
        import imageio.v2 as imageio
        imageio.mimwrite(out_path, frames, fps=fps)
        return out_path
    except Exception:
        stem = os.path.splitext(out_path)[0]
        os.makedirs(stem, exist_ok=True)
        from PIL import Image
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(stem, f"frame_{i:04d}.png"))
        return stem
