"""Convenience API: the reference's model-level entry points as functions.

Reference surface being mirrored: MixtureOfGaussians.forward/trace
(threedgrut/model/model.py:587-609) and checkpoint/scene loading. All
functions operate on the Gaussians pytree and are jit-compatible.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp

from threedgrut_tpu import constants as C
from threedgrut_tpu.cameras import Camera, SensorPose
from threedgrut_tpu.model.gaussians import Gaussians


def load_scene(path: str, capacity: Optional[int] = None) -> Gaussians:
    """Load a scene from .ply (3DGS), .ingp, or .npz checkpoint."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        from threedgrut_tpu.export.ply import import_ply
        return import_ply(path, capacity=capacity)
    if ext == ".ingp":
        from threedgrut_tpu.export.ingp import import_ingp
        return import_ingp(path, capacity=capacity)
    if ext == ".npz":
        import dataclasses
        import numpy as np
        data = np.load(path)
        return Gaussians(**{f.name: jnp.asarray(data[f"params/{f.name}"])
                            for f in dataclasses.fields(Gaussians)})
    raise ValueError(f"unsupported scene format {ext!r}")


def render(params: Gaussians, cam: Camera, pose: SensorPose,
           resolution: Tuple[int, int], method: str = "3dgut",
           sh_degree: Optional[int] = None, isect_capacity: int = 1 << 20,
           **kw):
    """Render a camera view (the reference's model.forward).

    method: "3dgut" (tile raster) or "3dgrt" (per-ray tracing)."""
    deg = sh_degree if sh_degree is not None else params.max_sh_degree
    args = (params.get_positions(), params.get_rotation(),
            params.get_scale(), params.get_density(), params.get_features())
    if method == "3dgut":
        from threedgrut_tpu.render import gut
        return gut.render(*args, cam, pose, resolution, isect_capacity,
                          sh_degree=deg, **kw)
    if method == "3dgrt":
        from threedgrut_tpu.render import grt
        return grt.render(*args, cam, pose, resolution, sh_degree=deg,
                          kernel_degree=C.KERNEL_DEGREE_3DGRT,
                          candidate_capacity=max(256, isect_capacity // 256),
                          **kw)
    raise ValueError(f"unknown method {method!r}")


def trace(params: Gaussians, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
          sh_degree: Optional[int] = None, **kw):
    """Trace arbitrary rays (the reference's model.trace inference API,
    model.py:598-609). rays padded to a multiple of 256 internally."""
    from threedgrut_tpu.render import grt
    deg = sh_degree if sh_degree is not None else params.max_sh_degree
    r = rays_o.shape[0]
    pad = (-r) % 256
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], axis=0)
        rays_d = jnp.concatenate([rays_d, jnp.zeros((pad, 3))], axis=0)
    out = grt.trace(params.get_positions(), params.get_rotation(),
                    params.get_scale(), params.get_density(),
                    params.get_features(), rays_o, rays_d, sh_degree=deg,
                    **kw)
    if pad:
        import jax
        out = jax.tree.map(
            lambda x: x[:r] if (hasattr(x, "shape") and x.shape
                               and x.shape[0] == r + pad) else x, out)
    return out
