"""Fused walked-window-compacted backward (ops/fused_raster.py) vs the
two-stage path (sorted_gather + tile_composite): forward bit-identical,
gradients allclose on BOTH cond branches (compact and dense fallback)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedgrut_tpu.ops import fused_raster
from threedgrut_tpu.ops.pallas import tile_raster
from threedgrut_tpu.render import gut
from tests.test_cameras import IDENTITY_POSE, make_pinhole
from tests.test_gut_reference import random_scene

RES = (32, 32)
CAM = make_pinhole(f=60.0, cx=16.0, cy=16.0)
CAP = 4096


def _dense_scene(n=96, seed=11):
    # Heavy overlap so saturation early-exit leaves never-walked windows.
    pos, quat, scale, opa, feats = random_scene(n=n, seed=seed, spread=0.15)
    return pos, quat, scale, jnp.minimum(opa * 1.3, 0.97), feats


def _walked_count(scene):
    """Walked-window count of the plain forward at (RES, CAP)."""
    pos, quat, scale, opa, feats = scene
    proj, binning, data_sorted, tile_grid = gut.prepare(
        pos, quat, scale, opa, feats, CAM, IDENTITY_POSE, RES, CAP)
    rays = gut.packed_world_rays(CAM, IDENTITY_POSE, tile_grid)
    from threedgrut_tpu import constants as C
    out = tile_raster._forward(
        data_sorted, binning.tile_starts, binning.tile_ends, rays,
        degree=C.KERNEL_DEGREE_3DGUT,
        min_transmittance=C.MIN_TRANSMITTANCE_3DGUT,
        min_response=C.MIN_KERNEL_RESPONSE,
        min_alpha=C.MIN_ALPHA, max_alpha=C.MAX_ALPHA)
    _, cnt = fused_raster.walked_window_mask(
        out, binning.tile_starts, CAP // tile_raster.CHUNK)
    return int(cnt)


def _grads(scene, walk_capacity, **kw):
    pos, quat, scale, opa, feats = scene
    target = jnp.full(RES[::-1] + (3,), 0.4)

    def loss(pos, quat, scale, opa, feats):
        out, ovf = gut.render(pos, quat, scale, opa, feats, CAM,
                              IDENTITY_POSE, RES, CAP,
                              walk_capacity=walk_capacity, **kw)
        return (jnp.mean((out.rgb - target) ** 2)
                + 0.1 * jnp.mean(out.opacity))

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(pos, quat, scale, opa,
                                                   feats)


def _assert_grads_match(ga, gb, rtol=1e-5, atol_scale=1e-6):
    names = ["positions", "quats", "scales", "opacities", "features"]
    for name, a, b in zip(names, ga, gb):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), name
        sc = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, atol=atol_scale * sc, rtol=rtol,
                                   err_msg=name)


def test_forward_identical():
    scene = _dense_scene()
    plain, ovf_p = gut.render(*scene, CAM, IDENTITY_POSE, RES, CAP)
    fused, ovf_f = gut.render(*scene, CAM, IDENTITY_POSE, RES, CAP,
                              walk_capacity=CAP // 2)
    assert bool(ovf_p) == bool(ovf_f)
    np.testing.assert_array_equal(np.asarray(fused.rgb),
                                  np.asarray(plain.rgb))
    np.testing.assert_array_equal(np.asarray(fused.opacity),
                                  np.asarray(plain.opacity))
    np.testing.assert_array_equal(np.asarray(fused.depth),
                                  np.asarray(plain.depth))


def test_gradients_compact_branch():
    scene = _dense_scene()
    cnt = _walked_count(scene)
    nw = CAP // tile_raster.CHUNK
    assert 0 < cnt < nw, (cnt, nw)  # early exit must leave unwalked windows
    # Bound ABOVE the walked count -> the compact branch runs by
    # construction; removing exactly-zero rows leaves the f32 segment sums
    # unchanged up to reassociation of the reduction.
    wc = min(CAP - 256, -(-(cnt + 2) * tile_raster.CHUNK // 256) * 256)
    assert wc // tile_raster.CHUNK >= cnt
    _assert_grads_match(_grads(scene, wc), _grads(scene, None))


def test_gradients_dense_fallback_branch():
    scene = _dense_scene()
    cnt = _walked_count(scene)
    assert cnt > 2  # bound BELOW the walked count -> fallback by construction
    _assert_grads_match(_grads(scene, 256), _grads(scene, None))


def test_gradients_compact_bf16_leg():
    scene = _dense_scene(n=64, seed=3)
    a = _grads(scene, CAP // 2, low_precision_grads=True)
    b = _grads(scene, None, low_precision_grads=True)
    # Both legs round per-slot cotangents to bf16 before their (different-
    # width) unsort sorts; sums agree to reassociation at bf16 granularity.
    _assert_grads_match(a, b, rtol=5e-3, atol_scale=5e-4)


def test_gradients_compact_sorted_mode():
    scene = _dense_scene(n=64, seed=21)
    a = _grads(scene, CAP // 2, sorted_passes=8)
    b = _grads(scene, None, sorted_passes=8)
    _assert_grads_match(a, b)


# ---- 3DGRT bundle twin (composite_bundles) ---------------------------------


def _grt_scene(n=512, seed=5):
    """Opaque ball in front of a coherent ray grid: bundles saturate early,
    so some candidate windows are never walked."""
    from tests.test_grt import coherent_rays
    rng = np.random.default_rng(seed)
    pos = (rng.normal(0, 0.25, (n, 3)) + [0, 0, 3.0]).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    scale = np.full((n, 3), 0.05, np.float32) * rng.uniform(0.5, 1.5, (n, 3))
    opa = rng.uniform(0.7, 0.97, n).astype(np.float32)
    feats = rng.uniform(-0.5, 0.5, (n, 16, 3)).astype(np.float32)
    o1, d1 = coherent_rays(256, seed=0)
    o = jnp.concatenate([o1] * 4)
    d = jnp.concatenate([coherent_rays(256, seed=s)[1] for s in range(4)])
    return (jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(scale),
            jnp.asarray(opa), jnp.asarray(feats)), (o, d)


def _grt_grads(scene, rays, walk_capacity):
    from threedgrut_tpu.render import grt
    pos, quat, scale, opa, feats = scene
    o, d = rays

    def loss(pos, opa, feats):
        out = grt.trace(pos, quat, scale, opa, feats, o, d,
                        candidate_capacity=512,
                        walk_capacity=walk_capacity)
        return jnp.mean(out.rgb) + 0.1 * jnp.mean(out.opacity)

    return jax.grad(loss, argnums=(0, 1, 2))(pos, opa, feats)


def test_grt_fused_forward_identical():
    from threedgrut_tpu.render import grt
    scene, (o, d) = _grt_scene()
    pos, quat, scale, opa, feats = scene
    plain = grt.trace(pos, quat, scale, opa, feats, o, d,
                      candidate_capacity=512)
    fused = grt.trace(pos, quat, scale, opa, feats, o, d,
                      candidate_capacity=512, walk_capacity=1024)
    np.testing.assert_array_equal(np.asarray(fused.rgb),
                                  np.asarray(plain.rgb))
    np.testing.assert_array_equal(np.asarray(fused.opacity),
                                  np.asarray(plain.opacity))


@pytest.mark.parametrize("walk_capacity", [256, 1024, 1792])
def test_grt_fused_gradients(walk_capacity):
    # Sweeping the bound exercises both cond branches (compact when the
    # walked-window union fits, dense fallback when it does not); gradient
    # equality with the plain path must hold either way.
    scene, rays = _grt_scene()
    a = _grt_grads(scene, rays, walk_capacity)
    b = _grt_grads(scene, rays, None)
    _assert_grads_match(a[:3], b[:3], rtol=1e-5, atol_scale=1e-6)
