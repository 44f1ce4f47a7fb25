"""Playground engine: hybrid path tracer over Gaussians + meshes.

Reference semantics: threedgrut_playground/engine.py (Engine3DGRUT) + the
playground OptiX kernel (playgroundKernel.cu:38-335): per pass, loop
{ mesh closest-hit -> volumetric Gaussian integration along the segment ->
BSDF bounce with throughput & emissive accumulation } until miss /
opacity >= threshold / maxBounces; plus SPP antialiasing jitter,
depth-of-field (Shirley disc), environment map lighting, progressive
accumulation, filmic tonemap.

TPU-native: the bounce loop is a static Python loop (max_bounces is small and
static) over fully batched ray states; mesh hits are dense Moller-Trumbore
(playground/mesh.py); Gaussian segments use the 3DGRT trace path with t_max
(render/grt.py). Everything jits into one program per (resolution, spp).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu import constants as C
from threedgrut_tpu.cameras import Camera, SensorPose, pose_from_matrix
from threedgrut_tpu.playground import envmap as env_mod
from threedgrut_tpu.playground import materials as mat_mod
from threedgrut_tpu.playground import mesh as mesh_mod
from threedgrut_tpu.render import grt, gut
from threedgrut_tpu.render.gut_reference import camera_space_rays


@dataclasses.dataclass
class EngineConfig:
    max_bounces: int = 4
    spp: int = 1
    candidate_capacity: int = 2048
    kernel_degree: int = C.KERNEL_DEGREE_3DGRT
    min_transmittance: float = C.MIN_TRANSMITTANCE_3DGRT_EVAL
    max_opacity: float = 0.995          # ray kill threshold (engine.py)
    sh_degree: int = 3
    tonemap: bool = False               # filmic HDR transform
    gamma: float = 1.0
    # Depth of field (Shirley concentric disc, engine.py DoF).
    use_dof: bool = False
    aperture: float = 0.01
    focus_z: float = 1.0
    # Denoiser toggle (reference: OptiX AI denoiser; here the SVGF-style
    # a-trous wavelet filter or a depth-guided bilateral,
    # playground/denoiser.py).
    denoise: bool = False
    denoiser: str = "atrous"            # "atrous" | "bilateral"


class Engine:
    """Headless playground renderer (the reference's Engine3DGRUT.render)."""

    def __init__(self, positions, quats, scales, opacities, features,
                 mesh: Optional[mesh_mod.TriangleMesh] = None,
                 materials: Optional[mat_mod.Materials] = None,
                 envmap: Optional[jnp.ndarray] = None,
                 config: Optional[EngineConfig] = None):
        self.gaussians = (positions, quats, scales, opacities, features)
        self.mesh = mesh
        self.materials = materials or mat_mod.make_materials(
            [dict(kind=mat_mod.MaterialKind.DIFFUSE)])
        self.envmap = envmap
        self.cfg = config or EngineConfig()

    # -- ray generation ----------------------------------------------------
    def _camera_rays(self, cam: Camera, T_to_world: jnp.ndarray,
                     resolution: Tuple[int, int], key: jax.Array,
                     jitter: bool):
        w, h = resolution
        if jitter:
            j = jax.random.uniform(key, (h, w, 2))
        else:
            j = None
        from threedgrut_tpu.cameras import (FisheyeCamera, PinholeCamera,
                                            fisheye_camera_rays,
                                            pinhole_camera_rays)
        if isinstance(cam, PinholeCamera):
            o, d = pinhole_camera_rays(cam, resolution, jitter=j)
        elif isinstance(cam, FisheyeCamera):
            o, d = fisheye_camera_rays(cam, resolution)
        else:
            raise TypeError(type(cam))
        if self.cfg.use_dof:
            key, sub = jax.random.split(key)
            o, d = self._apply_dof(o, d, sub)
        R = T_to_world[:3, :3]
        t = T_to_world[:3, 3]
        ow = o.reshape(-1, 3) @ R.T + t
        dw = d.reshape(-1, 3) @ R.T
        dw = dw / jnp.linalg.norm(dw, axis=-1, keepdims=True)
        return ow, dw

    def _apply_dof(self, o, d, key):
        """Shirley concentric disc lens sampling (engine.py DoF path)."""
        u = jax.random.uniform(key, o.shape[:-1] + (2,)) * 2.0 - 1.0
        r = jnp.where(jnp.abs(u[..., 0]) > jnp.abs(u[..., 1]),
                      u[..., 0], u[..., 1])
        theta = jnp.where(
            jnp.abs(u[..., 0]) > jnp.abs(u[..., 1]),
            (jnp.pi / 4) * (u[..., 1] / jnp.where(u[..., 0] == 0, 1.0,
                                                  u[..., 0])),
            (jnp.pi / 2) - (jnp.pi / 4) * (u[..., 0] / jnp.where(
                u[..., 1] == 0, 1.0, u[..., 1])))
        lens = self.cfg.aperture * jnp.stack(
            [r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
        focus_t = self.cfg.focus_z / jnp.maximum(d[..., 2], 1e-6)
        focus_p = o + d * focus_t[..., None]
        o2 = o + jnp.concatenate([lens, jnp.zeros_like(lens[..., :1])], -1)
        d2 = focus_p - o2
        d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
        return o2, d2

    # -- core pass ---------------------------------------------------------
    def _trace_pass(self, ray_o, ray_d, pad_to: int):
        """One full path-traced pass over [R, 3] world rays."""
        cfg = self.cfg
        pos, quats, scales, opac, feats = self.gaussians
        r = ray_o.shape[0]
        pad = pad_to - r

        def padr(x, fill=0.0):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)

        o = padr(ray_o)
        d = padr(ray_d)   # padded rays have zero dir -> inactive in grt.trace

        radiance = jnp.zeros((pad_to, 3))
        throughput = jnp.ones((pad_to, 3))
        alive = jnp.ones((pad_to,), bool).at[r:].set(False)
        total_opacity = jnp.zeros((pad_to,))
        first_depth = jnp.full((pad_to,), jnp.inf)

        for bounce_i in range(cfg.max_bounces):
            mh = mesh_mod.intersect(self.mesh, o, d)
            seg = grt.trace(
                pos, quats, scales, opac, feats, o,
                jnp.where(alive[:, None], d, 0.0),
                sh_degree=cfg.sh_degree, kernel_degree=cfg.kernel_degree,
                min_transmittance=cfg.min_transmittance,
                candidate_capacity=cfg.candidate_capacity,
                t_max=mh.t)
            radiance = radiance + throughput * seg.rgb
            total_opacity = total_opacity + jnp.where(
                alive, seg.opacity * throughput.mean(-1), 0.0)
            t_local = seg.transmittance
            if bounce_i == 0:
                first_depth = jnp.where(
                    jnp.isfinite(mh.t), jnp.minimum(mh.t, seg.depth),
                    seg.depth)

            hit_mesh = alive & (mh.material_id >= 0)
            miss = alive & ~jnp.isfinite(mh.t)

            # Miss: environment light through the remaining transmittance.
            env = env_mod.sample_envmap(self.envmap, d)
            radiance = radiance + jnp.where(
                miss[:, None], throughput * t_local[:, None] * env, 0.0)

            # Mesh hit: shade and continue.
            env_at_n = env_mod.sample_envmap(self.envmap, mh.normal,
                                             default_color=(1.0, 1.0, 1.0))
            nd, atten, emitted, cont = mat_mod.bounce(
                self.materials, mh.material_id, d, mh.normal, env_at_n,
                uv=mh.uv, tangent=mh.tangent)
            radiance = radiance + jnp.where(
                hit_mesh[:, None], throughput * t_local[:, None] * emitted,
                0.0)
            new_throughput = throughput * t_local[:, None] * atten
            hit_p = o + d * mh.t[:, None]
            cont_mask = (hit_mesh & cont
                         & (jnp.max(new_throughput, -1) > 1e-4)
                         & (total_opacity < cfg.max_opacity))
            o = jnp.where(cont_mask[:, None],
                          hit_p + nd * 1e-4, o)
            d = jnp.where(cont_mask[:, None], nd, d)
            throughput = jnp.where(cont_mask[:, None], new_throughput,
                                   throughput)
            alive = cont_mask

        return radiance[:r], total_opacity[:r], first_depth[:r]

    # -- hybrid 3DGRUT: rasterized primary + traced secondary --------------
    def render_hybrid(self, cam: Camera, T_to_world: jnp.ndarray,
                      resolution: Tuple[int, int],
                      key: Optional[jax.Array] = None
                      ) -> Dict[str, jnp.ndarray]:
        """The reference's hybrid mode (README.md 3DGRUT): primary rays are
        RASTERIZED with 3DGUT (segment-bounded by mesh hits via the per-ray
        t_max ray channel), secondary reflection/refraction rays are TRACED
        with the 3DGRT path. Consistent because both evaluate the identical
        3D ray-space response."""
        cfg = self.cfg
        w, h = resolution
        pos, quats, scales, opac, feats = self.gaussians
        key = key if key is not None else jax.random.PRNGKey(0)
        pose = pose_from_matrix(T_to_world)
        wp, hp = gut.pad_to_tiles(resolution)
        tile_grid = (wp // 16, hp // 16)

        # Primary camera rays on the padded grid (matching the raster grid).
        rays_pk = gut.packed_world_rays(cam, pose, tile_grid, T_to_world)
        o = rays_pk[:, 0:3, :].transpose(0, 2, 1).reshape(-1, 3)
        d = rays_pk[:, 3:6, :].transpose(0, 2, 1).reshape(-1, 3)
        mh = mesh_mod.intersect(self.mesh, o, d)

        tmax_img = gut.tile_unpack(
            jnp.where(jnp.isfinite(mh.t), mh.t, 0.0)
            .reshape(tile_grid[1] * tile_grid[0], 256, 1)
            .transpose(0, 2, 1), tile_grid)[..., 0]
        outputs, overflow = gut.render(
            pos, quats, scales, opac, feats, cam, pose, resolution,
            cfg.candidate_capacity * 256, sh_degree=cfg.sh_degree,
            kernel_degree=2, min_transmittance=cfg.min_transmittance,
            T_to_world=T_to_world, t_max=tmax_img)

        def unflat(x):
            img = x.reshape(tile_grid[1] * tile_grid[0], 256, -1)
            return gut.tile_unpack(img.transpose(0, 2, 1), tile_grid)

        t_img = unflat(jnp.where(jnp.isfinite(mh.t), mh.t, 0.0))[..., 0]
        hit_img = unflat((mh.material_id >= 0)
                         .astype(jnp.float32))[..., 0] > 0.5
        radiance = outputs.rgb
        trans = outputs.transmittance[..., None]

        # Mesh shading + traced continuation (flat over padded rays).
        env_at_n = env_mod.sample_envmap(self.envmap, mh.normal,
                                         default_color=(1.0, 1.0, 1.0))
        nd, atten, emitted, cont = mat_mod.bounce(
            self.materials, mh.material_id, d, mh.normal, env_at_n,
            uv=mh.uv, tangent=mh.tangent)
        hit_mesh = mh.material_id >= 0
        hit_p = o + d * jnp.where(jnp.isfinite(mh.t), mh.t, 0.0)[:, None]
        cont_mask = hit_mesh & cont
        sec_o = hit_p + nd * 1e-4
        sec_d = jnp.where(cont_mask[:, None], nd, 0.0)
        sec_rgb, _, _ = self._trace_pass(sec_o, sec_d, sec_o.shape[0])

        emitted_img = unflat(jnp.where(hit_mesh[:, None], emitted, 0.0))
        atten_img = unflat(jnp.where(cont_mask[:, None], atten, 0.0))
        sec_img = unflat(sec_rgb)
        radiance = radiance + trans * (emitted_img[:h, :w]
                                       + atten_img[:h, :w] * sec_img[:h, :w])

        # Environment through fully transparent non-mesh pixels.
        env_bg = env_mod.sample_envmap(self.envmap, d)
        env_img = unflat(jnp.where(~hit_mesh[:, None], env_bg, 0.0))
        radiance = radiance + trans * env_img[:h, :w]

        rgb = radiance
        if cfg.tonemap:
            rgb = env_mod.filmic_tonemap(rgb)
        if cfg.gamma != 1.0:
            rgb = jnp.power(jnp.clip(rgb, 0.0, 1.0), 1.0 / cfg.gamma)
        return {"rgb": rgb, "opacity": outputs.opacity,
                "depth": jnp.where(hit_img[:h, :w], t_img[:h, :w],
                                   outputs.depth),
                "overflow": overflow}

    # -- public API --------------------------------------------------------
    def render(self, cam: Camera, T_to_world: jnp.ndarray,
               resolution: Tuple[int, int],
               key: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        """Render a frame — ONE jitted program per static (config,
        resolution); all scene state is passed as arguments (never closed
        over: eager dispatch is unusable on the remote-TPU setup,
        CLAUDE.md)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        return _render_jit(self.gaussians, self.mesh, self.materials,
                           self.envmap, cam, jnp.asarray(T_to_world), key,
                           _cfg_static(self.cfg), resolution)

    def render_hybrid_jit(self, cam: Camera, T_to_world: jnp.ndarray,
                          resolution: Tuple[int, int],
                          key: Optional[jax.Array] = None
                          ) -> Dict[str, jnp.ndarray]:
        """Jitted wrapper over render_hybrid (same per-config caching)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        return _render_hybrid_jit(self.gaussians, self.mesh, self.materials,
                                  self.envmap, cam, jnp.asarray(T_to_world),
                                  key, _cfg_static(self.cfg), resolution)

    def _render_eager(self, cam: Camera, T_to_world: jnp.ndarray,
                      resolution: Tuple[int, int],
                      key: Optional[jax.Array] = None
                      ) -> Dict[str, jnp.ndarray]:
        """Render a frame with cfg.spp progressive passes."""
        cfg = self.cfg
        w, h = resolution
        key = key if key is not None else jax.random.PRNGKey(0)
        n_rays = w * h
        pad_to = -(-n_rays // 256) * 256

        acc = jnp.zeros((n_rays, 3))
        opac_acc = jnp.zeros((n_rays,))
        depth = None
        for s in range(cfg.spp):
            key, kr = jax.random.split(key)
            o, d = self._camera_rays(cam, T_to_world, resolution, kr,
                                     jitter=cfg.spp > 1)
            rgb, op, dep = self._trace_pass(o, d, pad_to)
            acc = acc + rgb
            opac_acc = opac_acc + op
            if depth is None:
                depth = dep
        rgb = acc / cfg.spp
        if cfg.denoise:
            from threedgrut_tpu.playground import denoiser as dn
            fn = (dn.atrous_denoise if cfg.denoiser == "atrous"
                  else dn.bilateral_denoise)
            rgb = fn(rgb.reshape(h, w, 3), depth.reshape(h, w)).reshape(-1, 3)
        if cfg.tonemap:
            rgb = env_mod.filmic_tonemap(rgb)
        if cfg.gamma != 1.0:
            rgb = jnp.power(jnp.clip(rgb, 0.0, 1.0), 1.0 / cfg.gamma)
        return {
            "rgb": rgb.reshape(h, w, 3),
            "opacity": (opac_acc / cfg.spp).reshape(h, w),
            "depth": depth.reshape(h, w),
        }


# ---------------------------------------------------------------------------
# Jitted entry points: the engine config is hashable field-wise (all
# scalars), so it doubles as the static cache key — toggling any option in
# the GUI retraces exactly once per distinct configuration.
# ---------------------------------------------------------------------------

def _cfg_static(cfg: EngineConfig):
    return tuple(dataclasses.asdict(cfg).items())


def _cfg_from_static(items) -> EngineConfig:
    return EngineConfig(**dict(items))


@functools.partial(jax.jit, static_argnames=("cfg_items", "resolution"))
def _render_jit(gaussians, mesh, materials, envmap, cam, T, key, cfg_items,
                resolution):
    eng = Engine(*gaussians, mesh=mesh, materials=materials, envmap=envmap,
                 config=_cfg_from_static(cfg_items))
    return eng._render_eager(cam, T, resolution, key)


@functools.partial(jax.jit, static_argnames=("cfg_items", "resolution"))
def _render_hybrid_jit(gaussians, mesh, materials, envmap, cam, T, key,
                       cfg_items, resolution):
    eng = Engine(*gaussians, mesh=mesh, materials=materials, envmap=envmap,
                 config=_cfg_from_static(cfg_items))
    return eng.render_hybrid(cam, T, resolution, key)
