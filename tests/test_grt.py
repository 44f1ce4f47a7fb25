"""3DGRT trace path: bundle-culled trace must match the naive oracle exactly
(conservative culling), handle secondary-style rays, and be differentiable."""
import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.render import grt
from tests.test_gut_reference import random_scene


def coherent_rays(n=256, seed=0):
    """A camera-like bundle looking at the scene (random_scene sits at z=3)."""
    rng = np.random.default_rng(seed)
    o = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (n, 1))
    d = np.stack([rng.uniform(-0.25, 0.25, n), rng.uniform(-0.25, 0.25, n),
                  np.ones(n)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def scattered_rays(n=256, seed=1):
    """Secondary-style rays: random origins near the scene, random dirs."""
    rng = np.random.default_rng(seed)
    o = (rng.uniform(-0.5, 0.5, (n, 3)) + [0, 0, 3.0]).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def assert_trace_close(a, b, atol=2e-5):
    np.testing.assert_allclose(a.rgb, b.rgb, atol=atol)
    np.testing.assert_allclose(a.opacity, b.opacity, atol=atol)
    np.testing.assert_allclose(a.transmittance, b.transmittance, atol=atol)
    np.testing.assert_allclose(a.depth, b.depth, atol=1e-4)


def test_bundle_trace_matches_oracle_coherent():
    pos, quat, scale, opa, feats = random_scene(n=96, seed=3)
    o, d = coherent_rays()
    fast = grt.trace(pos, quat, scale, opa, feats, o, d,
                     candidate_capacity=96)
    ref = grt.trace_naive(pos, quat, scale, opa, feats, o, d)
    assert not bool(fast.overflow)
    assert_trace_close(fast, ref)


def test_bundle_trace_matches_oracle_scattered():
    pos, quat, scale, opa, feats = random_scene(n=96, seed=4)
    o, d = scattered_rays()
    fast = grt.trace(pos, quat, scale, opa, feats, o, d,
                     candidate_capacity=96)
    ref = grt.trace_naive(pos, quat, scale, opa, feats, o, d)
    assert not bool(fast.overflow)
    assert_trace_close(fast, ref)


def test_behind_origin_particles_ignored():
    pos, quat, scale, opa, feats = random_scene(n=32, seed=5)
    # All rays point +z from z=+10; the scene (around z=3) is behind.
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 10.0]]), (256, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (256, 1))
    out = grt.trace_naive(pos, quat, scale, opa, feats, o, d)
    np.testing.assert_allclose(out.opacity, 0.0, atol=1e-7)
    np.testing.assert_allclose(out.transmittance, 1.0, atol=1e-7)


def test_trace_differentiable():
    pos, quat, scale, opa, feats = random_scene(n=48, seed=6)
    o, d = coherent_rays()

    def loss(pos, opa, feats):
        out = grt.trace(pos, quat, scale, opa, feats, o, d,
                        candidate_capacity=48)
        return jnp.mean(out.rgb) + jnp.mean(out.opacity)

    g = jax.grad(loss, argnums=(0, 1, 2))(pos, opa, feats)
    for arr in g:
        assert np.all(np.isfinite(np.asarray(arr)))
    assert float(jnp.abs(g[1]).max()) > 0  # opacity gradient flows


def test_overflow_flag():
    pos, quat, scale, opa, feats = random_scene(n=96, seed=3)
    o, d = coherent_rays()
    out = grt.trace(pos, quat, scale, opa, feats, o, d,
                    candidate_capacity=8)
    assert bool(out.overflow)


def test_camera_render_3dgrt():
    from tests.test_cameras import IDENTITY_POSE, make_pinhole
    pos, quat, scale, opa, feats = random_scene(n=64, seed=7)
    cam = make_pinhole(f=60.0, cx=16.0, cy=16.0)
    out, overflow = grt.render(pos, quat, scale, opa, feats, cam,
                               IDENTITY_POSE, (32, 32),
                               candidate_capacity=64)
    assert not bool(overflow)
    assert out.rgb.shape == (32, 32, 3)
    assert float(out.opacity.max()) > 0.1


def test_secondary_reflection_rays():
    """Trace primary rays, reflect at the depth point, trace again —
    the 3DGRT headline capability (secondary rays)."""
    pos, quat, scale, opa, feats = random_scene(n=64, seed=8)
    o, d = coherent_rays()
    first = grt.trace(pos, quat, scale, opa, feats, o, d,
                      candidate_capacity=64)
    hit_p = o + d * first.depth[:, None]
    normal = jnp.asarray([[0.0, 0.0, -1.0]])
    refl = d - 2.0 * jnp.sum(d * normal, -1, keepdims=True) * normal
    second = grt.trace(pos, quat, scale, opa, feats, hit_p, refl,
                       candidate_capacity=64,
                       initial_transmittance=first.transmittance)
    assert not bool(second.overflow)
    assert np.all(np.isfinite(np.asarray(second.rgb)))
    # Continued transmittance can only decrease.
    assert np.all(np.asarray(second.transmittance)
                  <= np.asarray(first.transmittance) + 1e-6)


def test_train_with_3dgrt_method():
    """Trainer end-to-end with render.method=3dgrt."""
    from threedgrut_tpu.config import Config
    from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset
    from threedgrut_tpu.model import gaussians
    from threedgrut_tpu.trainer import Trainer

    ds = SyntheticDataset(num_views=3, resolution=(32, 32),
                          num_gt_gaussians=24, seed=9)
    cfg = Config()
    cfg.render.method = "3dgrt"
    cfg.render.particle_kernel_degree = 4
    cfg.render.min_transmittance = 0.001
    cfg.render.isect_capacity = 64 * 256  # candidate capacity 64
    params = gaussians.init_from_points(np.asarray(ds.scene[0]), capacity=64)
    tr = Trainer(cfg, ds, val_dataset=ds, params=params)
    before = tr.validate()["psnr"]
    tr.run(iterations=15, log_every=0)
    after = tr.validate()["psnr"]
    assert after > before, (before, after)


def test_trace_normals():
    pos, quat, scale, opa, feats = random_scene(n=48, seed=10)
    o, d = coherent_rays()
    out = grt.trace(pos, quat, scale, opa, feats, o, d,
                    candidate_capacity=48, return_normals=True)
    n = np.asarray(out.normal)
    assert n.shape == (256, 3)
    assert np.isfinite(n).all()
    # Where rays hit something, normals have nonzero magnitude.
    hit = np.asarray(out.opacity) > 0.3
    assert np.linalg.norm(n[hit], axis=-1).min() > 1e-3
