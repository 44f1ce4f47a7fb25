"""Playground materials: diffuse / mirror / glass / PBR metallic-roughness.

Reference semantics: threedgrut_playground/include/playground/materials.cuh
(metallic-roughness BRDF, refraction with Schlick fresnel) and engine.py's
PBRMaterial container. Functional: each material maps an incoming ray + hit
to (next_dir, attenuation, emitted). Sampling uses a single bounce direction
(the reference playground is a Whitted-style tracer with one continuation ray
per hit, not an MC integrator).
"""
from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp


class MaterialKind(enum.IntEnum):
    DIFFUSE = 0
    MIRROR = 1
    GLASS = 2
    PBR = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Materials:
    """Struct-of-arrays material table, indexed by material_id.

    Textures (reference: the metallic-roughness texture stacks +
    normal maps of materials.cuh:1-454) live in per-material stacks of one
    shared size; materials without a texture carry a 1-pixel neutral level
    and has_* == 0. Base-color textures MULTIPLY the base_color factor
    (glTF semantics); normal maps are tangent-space.
    """
    kind: jnp.ndarray            # [M] int32
    base_color: jnp.ndarray      # [M, 3]
    metallic: jnp.ndarray        # [M]
    roughness: jnp.ndarray       # [M]
    ior: jnp.ndarray             # [M]
    emissive: jnp.ndarray        # [M, 3]
    tex_color: jnp.ndarray       # [M, TH, TW, 3]
    has_tex: jnp.ndarray         # [M] int32
    tex_normal: jnp.ndarray      # [M, NH, NW, 3] in [0, 1]
    has_normal_tex: jnp.ndarray  # [M] int32


def _stack_textures(texs, size_default=(1, 1), neutral=(1.0, 1.0, 1.0)):
    """Stack per-material textures (or None) to one [M, H, W, 3] array."""
    import numpy as np
    hs = [t.shape[0] for t in texs if t is not None] or [size_default[0]]
    ws = [t.shape[1] for t in texs if t is not None] or [size_default[1]]
    H, W = max(hs), max(ws)
    out = np.empty((len(texs), H, W, 3), np.float32)
    has = np.zeros((len(texs),), np.int32)
    for i, t in enumerate(texs):
        if t is None:
            out[i] = np.asarray(neutral, np.float32)
        else:
            t = np.asarray(t, np.float32)
            if t.shape[:2] != (H, W):
                yi = (np.arange(H) * t.shape[0] // H)
                xi = (np.arange(W) * t.shape[1] // W)
                t = t[yi][:, xi]
            out[i] = t[..., :3]
            has[i] = 1
    return out, has


def make_materials(specs) -> Materials:
    import numpy as np
    kinds, colors, metallic, rough, ior, emis = [], [], [], [], [], []
    texs, ntexs = [], []
    for s in specs:
        kinds.append(int(s.get("kind", MaterialKind.DIFFUSE)))
        colors.append(s.get("base_color", (0.8, 0.8, 0.8)))
        metallic.append(s.get("metallic", 0.0))
        rough.append(s.get("roughness", 0.5))
        ior.append(s.get("ior", 1.5))
        emis.append(s.get("emissive", (0.0, 0.0, 0.0)))
        texs.append(s.get("base_color_texture"))
        ntexs.append(s.get("normal_texture"))
    tex, has_tex = _stack_textures(texs)
    ntex, has_ntex = _stack_textures(ntexs, neutral=(0.5, 0.5, 1.0))
    return Materials(
        kind=jnp.asarray(np.asarray(kinds, np.int32)),
        base_color=jnp.asarray(np.asarray(colors, np.float32)),
        metallic=jnp.asarray(np.asarray(metallic, np.float32)),
        roughness=jnp.asarray(np.asarray(rough, np.float32)),
        ior=jnp.asarray(np.asarray(ior, np.float32)),
        emissive=jnp.asarray(np.asarray(emis, np.float32)),
        tex_color=jnp.asarray(tex),
        has_tex=jnp.asarray(has_tex),
        tex_normal=jnp.asarray(ntex),
        has_normal_tex=jnp.asarray(has_ntex))


def sample_texture(tex: jnp.ndarray, mid: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear sample tex [M, H, W, 3] at per-ray (material, uv) — wrap
    addressing (reference cudaTextureObject default)."""
    h, w = tex.shape[1], tex.shape[2]
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    x1i = jnp.mod(x0i + 1, w)
    y1i = jnp.mod(y0i + 1, h)
    c00 = tex[mid, y0i, x0i]
    c10 = tex[mid, y0i, x1i]
    c01 = tex[mid, y1i, x0i]
    c11 = tex[mid, y1i, x1i]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n


def refract(d, n, eta):
    """Snell refraction; falls back to reflection on TIR."""
    cos_i = -jnp.sum(d * n, -1, keepdims=True)
    sin2_t = eta * eta * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    refr = eta * d + (eta * cos_i - cos_t) * n
    return jnp.where(tir, reflect(d, n), refr), tir[..., 0]


def schlick(cos_i, f0):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cos_i, 0.0, 1.0), 5.0)


def bounce(materials: Materials, mat_id: jnp.ndarray, d: jnp.ndarray,
           n: jnp.ndarray, env_radiance: jnp.ndarray,
           uv: jnp.ndarray | None = None,
           tangent: jnp.ndarray | None = None):
    """Per-hit shading: returns (next_dir [R,3], attenuation [R,3],
    emitted [R,3], continue_mask [R]).

    Shading model (playground semantics):
      DIFFUSE: terminate with base_color * max(0, -d.n) * env ambient.
      MIRROR: perfect reflection, attenuation = base_color.
      GLASS: fresnel-weighted refraction (single continuation along the
        refracted ray; reflection weight folded into attenuation).
      PBR: metallic-roughness — specular reflection lerped toward the normal
        by roughness; diffuse term emitted locally.

    With `uv` (+`tangent`) provided, base-color textures modulate the color
    and tangent-space normal maps perturb the shading normal
    (materials.cuh texture stacks / normal mapping).
    """
    mid = jnp.clip(mat_id, 0, materials.kind.shape[0] - 1)
    kind = materials.kind[mid]
    color = materials.base_color[mid]
    if uv is not None:
        tex_rgb = sample_texture(materials.tex_color, mid, uv)
        color = jnp.where(materials.has_tex[mid][:, None] > 0,
                          color * tex_rgb, color)
        if tangent is not None:
            tn = sample_texture(materials.tex_normal, mid, uv) * 2.0 - 1.0
            bitan = jnp.cross(n, tangent)
            n_pert = (tangent * tn[:, 0:1] + bitan * tn[:, 1:2]
                      + n * tn[:, 2:3])
            n_pert = n_pert / jnp.maximum(
                jnp.linalg.norm(n_pert, axis=-1, keepdims=True), 1e-12)
            n = jnp.where(materials.has_normal_tex[mid][:, None] > 0,
                          n_pert, n)
    metallic = materials.metallic[mid][:, None]
    rough = materials.roughness[mid][:, None]
    ior = materials.ior[mid]
    emissive = materials.emissive[mid]

    entering = jnp.sum(d * n, -1) < 0
    n_face = jnp.where(entering[:, None], n, -n)
    cos_i = jnp.clip(-jnp.sum(d * n_face, -1), 0.0, 1.0)

    refl = reflect(d, n_face)
    eta = jnp.where(entering, 1.0 / ior, ior)
    refr, tir = refract(d, n_face, eta[:, None])
    f0 = ((ior - 1.0) / (ior + 1.0)) ** 2
    fres = schlick(cos_i, f0)

    ndotl = jnp.clip(-jnp.sum(d * n_face, -1, keepdims=True), 0.0, 1.0)
    diffuse_rgb = color * ndotl * env_radiance

    is_diffuse = kind == MaterialKind.DIFFUSE
    is_mirror = kind == MaterialKind.MIRROR
    is_glass = kind == MaterialKind.GLASS
    is_pbr = kind == MaterialKind.PBR

    # PBR: blend mirror direction toward the normal by roughness (the
    # reference's single-sample GGX-lobe approximation for its viewer).
    pbr_dir = refl * (1.0 - rough) + n_face * rough
    pbr_dir = pbr_dir / jnp.maximum(
        jnp.linalg.norm(pbr_dir, axis=-1, keepdims=True), 1e-12)
    spec_w = metallic + (1.0 - metallic) * fres[:, None]

    next_dir = jnp.where(is_mirror[:, None], refl,
                         jnp.where(is_glass[:, None], refr,
                                   jnp.where(is_pbr[:, None], pbr_dir, d)))
    atten = jnp.where(is_mirror[:, None], color,
                      jnp.where(is_glass[:, None],
                                (1.0 - fres[:, None]) * color,
                                jnp.where(is_pbr[:, None], spec_w * color,
                                          0.0)))
    emitted = emissive + jnp.where(
        is_diffuse[:, None], diffuse_rgb,
        jnp.where(is_pbr[:, None], (1.0 - spec_w) * diffuse_rgb, 0.0))
    cont = is_mirror | is_glass | is_pbr
    return next_dir, atten, emitted, cont
