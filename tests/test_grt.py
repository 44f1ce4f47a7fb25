"""3DGRT trace path: bundle-culled trace must match the naive oracle exactly
(conservative culling), handle secondary-style rays, and be differentiable."""
import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.ops.pallas import tile_raster
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
                     candidate_capacity=96, order="ray")
    ref = grt.trace_naive(pos, quat, scale, opa, feats, o, d)
    assert not bool(fast.overflow)
    assert_trace_close(fast, ref)


def test_bundle_trace_matches_oracle_scattered():
    pos, quat, scale, opa, feats = random_scene(n=96, seed=4)
    o, d = scattered_rays()
    fast = grt.trace(pos, quat, scale, opa, feats, o, d,
                     candidate_capacity=96, order="ray")
    ref = grt.trace_naive(pos, quat, scale, opa, feats, o, d)
    assert not bool(fast.overflow)
    assert_trace_close(fast, ref)


def separated_scene(n=48, seed=11, spacing=0.3):
    """Particles on well-separated depth layers: per-ray hit order provably
    equals the bundle-axis order (layer spacing >> iso-response radius), so
    the Pallas bundle path must be EXACT against the per-ray oracle."""
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(-0.6, 0.6, n), rng.uniform(-0.6, 0.6, n),
                    2.0 + spacing * np.arange(n)], -1).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    scale = np.full((n, 3), 0.02, np.float32) * rng.uniform(0.5, 1.5, (n, 3))
    opa = rng.uniform(0.3, 0.9, n).astype(np.float32)
    feats = rng.uniform(-0.5, 0.5, (n, 16, 3)).astype(np.float32)
    return (jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(scale),
            jnp.asarray(opa), jnp.asarray(feats))


def test_bundle_kernel_matches_oracle_separated():
    pos, quat, scale, opa, feats = separated_scene()
    o, d = coherent_rays()
    fast = grt.trace(pos, quat, scale, opa, feats, o, d,
                     candidate_capacity=48, order="bundle", sorted_passes=0)
    ref = grt.trace_naive(pos, quat, scale, opa, feats, o, d)
    assert not bool(fast.overflow)
    assert_trace_close(fast, ref)
    np.testing.assert_allclose(fast.hit_count, ref.hit_count, atol=0)


def test_bundle_kernel_grad_matches_ray_path():
    """Backward Pallas kernel vs the autodiffed jnp path — identical math
    when ordering agrees, including the in-kernel SH coefficient grads."""
    pos, quat, scale, opa, feats = separated_scene(n=32, seed=12)
    o, d = coherent_rays(seed=13)

    def loss(order):
        def f(pos, quat, scale, opa, feats):
            out = grt.trace(pos, quat, scale, opa, feats, o, d,
                            candidate_capacity=32, order=order,
                            sorted_passes=0)
            return (jnp.sum(out.rgb * out.rgb) + jnp.sum(out.opacity)
                    + 0.1 * jnp.sum(out.depth))
        return f

    g_k = jax.grad(loss("bundle"), argnums=(0, 1, 2, 3, 4))(
        pos, quat, scale, opa, feats)
    g_r = jax.grad(loss("ray"), argnums=(0, 1, 2, 3, 4))(
        pos, quat, scale, opa, feats)
    names = ("pos", "quat", "scale", "opa", "feats")
    for name, a, b in zip(names, g_k, g_r):
        a, b = np.asarray(a), np.asarray(b)
        if name == "quat":
            # The two paths' hit_t formulas differ by a |R(q)^T d| factor
            # that is 1 at unit quats but carries a RADIAL gradient; the
            # model normalizes quats, so only the tangential component is
            # observable. Compare after projecting out the radial part.
            q = np.asarray(quat)
            a = a - (np.sum(a * q, -1, keepdims=True)) * q
            b = b - (np.sum(b * q, -1, keepdims=True)) * q
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4,
                                   err_msg=name)


def inversion_bundle_scene(n=24, seed=31):
    """Near-equal bundle depths with strongly tilted flat pancakes: per-ray
    hit order inverts against the bundle-axis order for off-axis rays (the
    case the reference resolves with its per-ray sorted k=16 hit buffer,
    referenceOptix.cu:210-248)."""
    rng = np.random.default_rng(seed)
    z = 2.0 + 0.012 * rng.permutation(n)          # shuffled near-ties
    pos = np.stack([rng.uniform(-0.15, 0.15, n), rng.uniform(-0.15, 0.15, n),
                    z], -1).astype(np.float32)
    # Tilt alternately +/- ~50 deg about y: quat = (cos t/2, 0, sin t/2, 0).
    t = np.where(np.arange(n) % 2 == 0, 0.9, -0.9)
    quat = np.stack([np.cos(t / 2), np.zeros(n), np.sin(t / 2),
                     np.zeros(n)], -1).astype(np.float32)
    scale = np.tile(np.array([[0.5, 0.5, 0.004]], np.float32), (n, 1))
    opa = rng.uniform(0.4, 0.8, n).astype(np.float32)
    feats = rng.uniform(-1.0, 1.0, (n, 16, 3)).astype(np.float32)
    feats[:, 1:] *= 0.1
    return (jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(scale),
            jnp.asarray(opa), jnp.asarray(feats))


def test_bundle_resort_matches_ray_oracle_on_inversions():
    """VERDICT r2 item 2: the fast bundle path with the in-kernel per-ray
    re-sort must match the exact per-ray-order oracle on a scene whose
    bundle order is WRONG per ray (and the unsorted fast path must visibly
    differ, or the test is vacuous). 28 odd-even passes fully sort any
    24-candidate window."""
    pos, quat, scale, opa, feats = inversion_bundle_scene()
    o, d = coherent_rays(seed=7)
    ref = grt.trace(pos, quat, scale, opa, feats, o, d,
                    candidate_capacity=24, order="ray")
    unsorted = grt.trace(pos, quat, scale, opa, feats, o, d,
                         candidate_capacity=24, order="bundle",
                         sorted_passes=0)
    assert np.abs(np.asarray(unsorted.rgb)
                  - np.asarray(ref.rgb)).max() > 1e-3
    fast = grt.trace(pos, quat, scale, opa, feats, o, d,
                     candidate_capacity=24, order="bundle",
                     sorted_passes=28)
    assert not bool(fast.overflow)
    np.testing.assert_allclose(fast.rgb, ref.rgb, atol=3e-5)
    np.testing.assert_allclose(fast.opacity, ref.opacity, atol=2e-5)
    np.testing.assert_allclose(fast.depth, ref.depth, atol=1e-4)

    # Gradients route through the recorded swap network in the backward.
    def loss(fn_kwargs):
        def f(pos, opa):
            out = grt.trace(pos, quat, scale, opa, feats, o, d,
                            candidate_capacity=24, **fn_kwargs)
            return jnp.sum(out.rgb * out.rgb) + jnp.sum(out.opacity)
        return f

    g_k = jax.grad(loss(dict(order="bundle", sorted_passes=28)),
                   argnums=(0, 1))(pos, opa)
    g_r = jax.grad(loss(dict(order="ray")), argnums=(0, 1))(pos, opa)
    for name, a, b in zip(("pos", "opa"), g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_twolevel_culling_matches_single_level():
    """bundle_candidates_twolevel must produce the same per-bundle candidate
    sets as the dense single-level test when the super list does not
    overflow (it is a conservative refinement, not an approximation)."""
    from threedgrut_tpu import constants as C
    pos, quat, scale, opa, feats = random_scene(n=96, seed=5)
    radius = grt.bounding_radius(scale, opa, C.KERNEL_DEGREE_3DGRT)
    valid = opa >= C.MIN_ALPHA
    # 32 coherent bundles (256 rays each) fanned over the scene.
    rng = np.random.default_rng(9)
    os_, ds_ = [], []
    for b in range(32):
        ang = 2 * np.pi * b / 32
        o = np.tile(np.array([0.3 * np.cos(ang), 0.3 * np.sin(ang), -1.0],
                             np.float32), (256, 1))
        d = np.stack([0.08 * np.cos(ang) + rng.uniform(-0.1, 0.1, 256),
                      0.08 * np.sin(ang) + rng.uniform(-0.1, 0.1, 256),
                      np.ones(256)], -1).astype(np.float32)
        os_.append(o)
        ds_.append(d / np.linalg.norm(d, axis=-1, keepdims=True))
    o = jnp.asarray(np.concatenate(os_))
    d = jnp.asarray(np.concatenate(ds_))

    cap = 96
    bundles = grt.make_bundles(o, d, 256)
    ci1, cn1, ovf1, vis1 = grt.bundle_candidates(pos, radius, valid,
                                                 bundles, cap)
    ci2, cn2, ovf2, vis2 = grt.bundle_candidates_twolevel(
        pos, radius, valid, o, d, 256, cap, super_mult=16,
        super_capacity=96)
    assert not bool(ovf1) and not bool(ovf2)
    np.testing.assert_array_equal(np.asarray(cn1), np.asarray(cn2))
    a1, a2 = np.asarray(ci1), np.asarray(ci2)
    for b in range(32):
        k = int(np.asarray(cn1)[b])
        assert set(a1[b, :k]) == set(a2[b, :k]), b
    # Super-level visibility is a superset of bundle-level visibility.
    assert not np.any(np.asarray(vis1) & ~np.asarray(vis2))


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


# ---- surfel (2DGS barycentric) variant ------------------------------------

def surfel_scene(n=32, seed=15):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                    2.5 + 0.2 * np.arange(n)], -1).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    scale = np.full((n, 3), 0.08, np.float32)
    opa = rng.uniform(0.4, 0.9, n).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1, 1, (n, 3))
    return tuple(map(jnp.asarray, (pos, quat, scale, opa, feats)))


def test_surfel_plane_response():
    """A flat surfel seen edge-on (ray parallel to its plane) never hits;
    the same ray hits the volumetric variant; a perpendicular ray through
    the center gets full response in both."""
    from threedgrut_tpu.ops import particles as P
    pos = jnp.asarray([[0.0, 0.0, 2.0]])
    quat = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])   # canonical z = world z
    scale = jnp.asarray([[0.2, 0.2, 0.2]])
    o_perp = jnp.asarray([0.0, 0.0, 0.0])
    d_perp = jnp.asarray([0.0, 0.0, 1.0])        # along z: hits plane center
    o_edge = jnp.asarray([0.0, -5.0, 2.0])
    d_edge = jnp.asarray([0.0, 1.0, 0.0])        # in-plane: parallel
    h = P.particle_hit(pos[0], quat[0], scale[0], 0.8, o_perp, d_perp,
                       kernel_degree=4, surfel=True)
    assert float(h.response) > 0.999
    np.testing.assert_allclose(float(h.hit_t), 2.0, rtol=1e-5)
    h2 = P.particle_hit(pos[0], quat[0], scale[0], 0.8, o_edge, d_edge,
                        kernel_degree=4, surfel=True)
    assert not bool(h2.accept)
    h3 = P.particle_hit(pos[0], quat[0], scale[0], 0.8, o_edge, d_edge,
                        kernel_degree=4, surfel=False)
    assert bool(h3.accept)   # volumetric variant hits through the center


def test_surfel_trace_matches_oracle():
    pos, quat, scale, opa, feats = surfel_scene()
    o, d = coherent_rays(seed=16)
    fast = grt.trace(pos, quat, scale, opa, feats, o, d,
                     candidate_capacity=32, order="ray", surfel=True)
    ref = grt.trace_naive(pos, quat, scale, opa, feats, o, d, surfel=True)
    assert_trace_close(fast, ref)
    # And surfel results genuinely differ from volumetric on this scene.
    vol = grt.trace_naive(pos, quat, scale, opa, feats, o, d, surfel=False)
    assert np.abs(np.asarray(ref.rgb) - np.asarray(vol.rgb)).max() > 1e-3


def test_surfel_gradcheck():
    from threedgrut_tpu.ops import particles as P
    rng = np.random.default_rng(17)
    pos = jnp.asarray(rng.normal(0, 0.1, 3).astype(np.float32)
                      + np.array([0, 0, 2], np.float32))
    quat = jnp.asarray((lambda q: q / np.linalg.norm(q))(
        rng.normal(size=4)).astype(np.float32))
    scale = jnp.asarray(np.full(3, 0.15, np.float32))
    o = jnp.zeros(3)
    d = jnp.asarray([0.05, -0.03, 1.0])
    d = d / jnp.linalg.norm(d)

    def f(pos, scale, dens):
        h = P.particle_hit(pos, quat, scale, dens, o, d, kernel_degree=4,
                           surfel=True)
        return h.alpha + 0.1 * h.hit_t

    g = jax.grad(f, argnums=(0, 1, 2))(pos, scale, jnp.float32(0.7))
    eps = 1e-3
    for ai, arg in enumerate([pos, scale]):
        for k in range(3):
            ap = arg.at[k].add(eps)
            am = arg.at[k].add(-eps)
            args_p = [pos, scale, jnp.float32(0.7)]
            args_m = [pos, scale, jnp.float32(0.7)]
            args_p[ai] = ap
            args_m[ai] = am
            fd = (f(*args_p) - f(*args_m)) / (2 * eps)
            np.testing.assert_allclose(float(g[ai][k]), float(fd),
                                       rtol=2e-2, atol=1e-4)


def test_surfel_normals():
    pos, quat, scale, opa, feats = surfel_scene(n=16)
    o, d = coherent_rays(seed=18)
    out = grt.trace(pos, quat, scale, opa, feats, o, d,
                    candidate_capacity=16, order="ray", surfel=True,
                    return_normals=True)
    n = np.asarray(out.normal)
    assert np.isfinite(n).all()


def test_flat_capacity_matches_dense():
    """The flat-compacted candidate layout (grt.flatten_candidates) must be
    a pure perf transform: a TIGHT flat capacity produces bit-identical
    outputs and gradients to the dense worst-case layout when the flat
    total fits, and raises the overflow flag when it does not."""
    pos, quat, scale, opa, feats = random_scene(n=64, seed=19)
    # 8 bundles: uneven loads — aim half the bundles away from the scene.
    rng = np.random.default_rng(4)
    os_, ds_ = [], []
    for b in range(8):
        to_scene = b < 3         # bundles 0-2 dense, 3-7 sparse
        tgt = (np.array([0.0, 0.0, 3.0]) if to_scene
               else np.array([6.0 * (b - 4), 8.0, -3.0]))
        o = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (256, 1))
        d = (tgt[None] - o) + rng.uniform(-0.25, 0.25, (256, 3))
        ds_.append((d / np.linalg.norm(d, axis=-1, keepdims=True))
                   .astype(np.float32))
        os_.append(o)
    o = jnp.asarray(np.concatenate(os_))
    d = jnp.asarray(np.concatenate(ds_))

    kw = dict(candidate_capacity=128, order="bundle", sorted_passes=0)

    def run(flat_capacity):
        def f(opa):
            out = grt.trace(pos, quat, scale, opa, feats, o, d, **kw,
                            flat_capacity=flat_capacity)
            return jnp.sum(out.rgb ** 2) + jnp.sum(out.opacity), out
        (loss, out), g = jax.value_and_grad(f, has_aux=True)(opa)
        return loss, out, g

    l0, out0, g0 = run(flat_capacity=None)       # dense worst case 8*128
    l1, out1, g1 = run(flat_capacity=512)        # tight
    assert not bool(out0.overflow) and not bool(out1.overflow)
    np.testing.assert_array_equal(np.asarray(out0.rgb), np.asarray(out1.rgb))
    np.testing.assert_array_equal(np.asarray(out0.depth),
                                  np.asarray(out1.depth))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))

    # Too tight -> overflow flagged (bundles past the capacity render
    # empty; a straddling bundle keeps its nearest candidates).
    _, out2, _ = run(flat_capacity=128)
    assert bool(out2.overflow)


def test_flatten_candidates_unit():
    """Direct unit test of the flat layout builder: empty bundles, counts
    below/at window multiples, window ranges, validity, and overflow."""
    from threedgrut_tpu.ops.pallas.bundle_trace import CHUNK

    nb, L = 4, 2 * CHUNK
    rng = np.random.default_rng(0)
    cand = jnp.asarray(rng.integers(0, 1000, (nb, L)).astype(np.int32))
    #          b0: empty  b1: 1 slot  b2: exactly 1 window  b3: 1.5 windows
    counts = jnp.asarray([0, 1, CHUNK, CHUNK + CHUNK // 2], jnp.int32)
    capF = 8 * CHUNK
    fi, valid, ws, we, ovf, wb = grt.flatten_candidates(cand, counts, capF)
    assert not bool(ovf)
    ws, we = np.asarray(ws), np.asarray(we)
    # b0 empty -> zero-width range; others CHUNK-padded and contiguous.
    np.testing.assert_array_equal(ws, [0, 0, 1, 2])
    np.testing.assert_array_equal(we, [0, 1, 2, 4])
    fi, valid = np.asarray(fi), np.asarray(valid)
    c = np.asarray(cand)
    # Valid prefixes carry the right candidates in order.
    np.testing.assert_array_equal(fi[0:1], c[1, :1])
    np.testing.assert_array_equal(fi[CHUNK:2 * CHUNK], c[2, :CHUNK])
    np.testing.assert_array_equal(fi[2 * CHUNK:2 * CHUNK + CHUNK + CHUNK // 2],
                                  c[3, :CHUNK + CHUNK // 2])
    # Validity masks exactly the counts.
    assert valid[:CHUNK].sum() == 1
    assert valid[CHUNK:2 * CHUNK].sum() == CHUNK
    assert valid[2 * CHUNK:4 * CHUNK].sum() == CHUNK + CHUNK // 2
    assert not valid[4 * CHUNK:].any()          # tail past total

    # Overflow: capF too small flags, straddling bundle clamps its range.
    fi2, valid2, ws2, we2, ovf2, _ = grt.flatten_candidates(
        cand, counts, 2 * CHUNK)
    assert bool(ovf2)
    assert (np.asarray(we2) <= 2).all()


def test_packed_cull_matches_exact():
    """packed_cull=True (single-operand quantized-key culling sorts) must
    produce the same candidate SETS as the exact two-level path; on a
    depth-separated scene (layer spacing >> quantization bucket) the
    compositing order is also identical, so outputs match bit-for-bit."""
    pos, quat, scale, opa, feats = separated_scene(n=128, seed=21)
    rng = np.random.default_rng(22)
    os_, ds_ = [], []
    for b in range(32):
        o = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (256, 1))
        d = np.stack([0.02 * (b % 6) + rng.uniform(-0.15, 0.15, 256),
                      0.02 * (b // 6) + rng.uniform(-0.15, 0.15, 256),
                      np.ones(256)], -1).astype(np.float32)
        os_.append(o)
        ds_.append(d / np.linalg.norm(d, axis=-1, keepdims=True))
    o = jnp.asarray(np.concatenate(os_))
    d = jnp.asarray(np.concatenate(ds_))

    kw = dict(candidate_capacity=128, super_capacity=64, order="bundle",
              sorted_passes=8, flat_capacity=4096)
    exact = grt.trace(pos, quat, scale, opa, feats, o, d, **kw)
    for pkw in (dict(packed_cull=True), dict(packed_l1=True)):
        packed = grt.trace(pos, quat, scale, opa, feats, o, d, **kw, **pkw)
        assert bool(exact.overflow) == bool(packed.overflow), pkw
        np.testing.assert_array_equal(np.asarray(exact.visibility),
                                      np.asarray(packed.visibility))
        np.testing.assert_array_equal(np.asarray(exact.rgb),
                                      np.asarray(packed.rgb))
        np.testing.assert_array_equal(np.asarray(exact.opacity),
                                      np.asarray(packed.opacity))
        np.testing.assert_array_equal(np.asarray(exact.depth),
                                      np.asarray(packed.depth))


def test_flat_cull_matches_exact():
    """flat_cull=True (flat-compacted super lists + segmented member-column
    depth sort) is a pure layout transform: identical candidate sets AND
    per-bundle order (same keys, same stable ties) as the dense two-level
    path, so OUTPUTS must match bit-for-bit on any scene. Gradients see the
    same cotangent rows at different FLAT positions (bundle layout order
    differs), so the per-particle segment sums reassociate — f32-reorder
    tolerance only, like the old tiered-capacity split."""
    pos, quat, scale, opa, feats = random_scene(n=96, seed=23)
    rng = np.random.default_rng(24)
    os_, ds_ = [], []
    for b in range(32):
        o = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (256, 1))
        d = np.stack([0.03 * (b % 6) + rng.uniform(-0.2, 0.2, 256),
                      0.03 * (b // 6) + rng.uniform(-0.2, 0.2, 256),
                      np.ones(256)], -1).astype(np.float32)
        os_.append(o)
        ds_.append(d / np.linalg.norm(d, axis=-1, keepdims=True))
    o = jnp.asarray(np.concatenate(os_))
    d = jnp.asarray(np.concatenate(ds_))

    # super_capacity >= counts1 and candidate_capacity >= counts2: the
    # bit-equality contract applies in the non-overflow regime (under
    # FLAGGED overflow the three cull paths keep different-but-degraded
    # subsets by design — top_k nearest, expansion lowest-id).
    kw = dict(candidate_capacity=128, super_capacity=128, order="bundle",
              sorted_passes=8, flat_capacity=8192)

    def run(flat):
        def f(opa):
            out = grt.trace(pos, quat, scale, opa, feats, o, d, **kw,
                            flat_cull=flat)
            return jnp.sum(out.rgb ** 2) + jnp.sum(out.opacity), out
        (_, out), g = jax.value_and_grad(f, has_aux=True)(opa)
        return out, g

    exact, g0 = run(False)
    flat, g1 = run(True)
    assert bool(exact.overflow) == bool(flat.overflow)
    np.testing.assert_array_equal(np.asarray(exact.visibility),
                                  np.asarray(flat.visibility))
    np.testing.assert_array_equal(np.asarray(exact.rgb),
                                  np.asarray(flat.rgb))
    np.testing.assert_array_equal(np.asarray(exact.opacity),
                                  np.asarray(flat.opacity))
    np.testing.assert_array_equal(np.asarray(exact.depth),
                                  np.asarray(flat.depth))
    a, b = np.asarray(g1), np.asarray(g0)
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-6 * np.abs(b).max())


def test_flat_cull_compact_kernel_matches_sort_path():
    """The stream-compaction kernel path of bundle_candidates_twolevel_flat
    (compact_kernel=True; Pallas in interpret mode here) must produce the
    SAME per-bundle candidate sequences as the segmented-sort path — the
    flat arrangements differ ((super, member)-major vs member-major), so
    compare per caller bundle through (win_starts, win_ends, valid)."""
    from threedgrut_tpu import constants as C

    pos, quat, scale, opa, feats = random_scene(n=96, seed=23)
    rng = np.random.default_rng(24)
    os_, ds_ = [], []
    for b in range(32):
        o = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (256, 1))
        d = np.stack([0.03 * (b % 6) + rng.uniform(-0.2, 0.2, 256),
                      0.03 * (b // 6) + rng.uniform(-0.2, 0.2, 256),
                      np.ones(256)], -1).astype(np.float32)
        os_.append(o)
        ds_.append(d / np.linalg.norm(d, axis=-1, keepdims=True))
    o = jnp.asarray(np.concatenate(os_))
    d = jnp.asarray(np.concatenate(ds_))

    radius = grt.bounding_radius(scale, opa, C.KERNEL_DEGREE_3DGRT)
    valid = opa >= C.MIN_ALPHA

    def run(kernel):
        return grt.bundle_candidates_twolevel_flat(
            pos, radius, valid, o, d, 256, capacity=192, super_mult=16,
            super_capacity=192, flat_capacity=8192, compact_kernel=kernel)

    fi0, v0, ws0, we0, ovf0, vis0 = run(False)
    fi1, v1, ws1, we1, ovf1, vis1 = run(True)
    assert bool(ovf0) == bool(ovf1)
    np.testing.assert_array_equal(np.asarray(vis0), np.asarray(vis1))
    fi0, v0 = np.asarray(fi0), np.asarray(v0)
    fi1, v1 = np.asarray(fi1), np.asarray(v1)
    ws0, we0 = np.asarray(ws0), np.asarray(we0)
    ws1, we1 = np.asarray(ws1), np.asarray(we1)
    total0 = total1 = 0
    for b in range(32):
        ch = tile_raster.CHUNK
        s0 = fi0[ws0[b] * ch:we0[b] * ch][v0[ws0[b] * ch:we0[b] * ch]]
        s1 = fi1[ws1[b] * ch:we1[b] * ch][v1[ws1[b] * ch:we1[b] * ch]]
        np.testing.assert_array_equal(s1, s0, err_msg=f"bundle {b}")
        total0 += len(s0)
        total1 += len(s1)
    assert total0 == total1 and total0 > 0


def test_visibility_is_cone_level_not_hit_level():
    """TraceResult.visibility documents the CONE-LEVEL pre-cull semantics
    (grt.trace docstring; reference referenceOptix.cu:158-161 writes the
    bit from anyhit, i.e. BVH intersection, not accepted hits): a particle
    fully occluded behind an opaque wall is visibility=True yet receives
    zero gradient — the hit-based mask the trainer feeds SelectiveAdam
    must come from nonzero grads, not from this bit."""
    rng = np.random.default_rng(7)
    # A 4-layer opaque wall at z=2.0..2.3 covering the bundle footprint,
    # then one particle hidden behind it at z=5.
    n_wall = 47
    pos = np.concatenate([
        np.stack([rng.uniform(-0.8, 0.8, n_wall),
                  rng.uniform(-0.8, 0.8, n_wall),
                  2.0 + 0.1 * (np.arange(n_wall) % 4)], -1),
        np.array([[0.0, 0.0, 5.0]]),
    ]).astype(np.float32)
    quat = np.tile(np.array([1.0, 0, 0, 0], np.float32), (48, 1))
    scale = np.full((48, 3), 0.6, np.float32)
    opa = np.full((48,), 0.995, np.float32)
    feats = rng.uniform(0.2, 0.8, (48, 16, 3)).astype(np.float32)
    pos, quat, scale, opa, feats = map(jnp.asarray,
                                       (pos, quat, scale, opa, feats))
    o, d = coherent_rays(seed=9)

    def loss(opa_):
        r = grt.trace(pos, quat, scale, opa_, feats, o, d,
                      candidate_capacity=64, order="bundle")
        return jnp.sum(r.rgb), r

    (val, res), g = jax.value_and_grad(loss, has_aux=True)(opa)
    vis = np.asarray(res.visibility)
    g = np.asarray(g)
    # The hidden particle's bounding sphere intersects the cones -> loose
    # bit set; the kernel terminates at min_transmittance long before z=5
    # -> exactly zero gradient.
    assert bool(vis[-1]), "cone-level visibility must include the occluded particle"
    assert g[-1] == 0.0, f"occluded particle must get zero grad, got {g[-1]}"
    # Sanity: the wall itself is both visible and gradient-carrying.
    assert np.any(g[:-1] != 0.0)


def test_flat_cull_expand_sort_matches_sort_path():
    """The r5 pair-expansion path (_flat_pairs_expand_sort) must produce
    BIT-IDENTICAL flat products to the segmented member-column sort at
    non-overflow shapes: same candidate sets, same per-bundle depth order,
    same stable tie order (super-list position)."""
    pos, quat, scale, opa, feats = random_scene(n=256, seed=31)
    rng = np.random.default_rng(32)
    os_, ds_ = [], []
    for b in range(32):
        o = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (256, 1))
        d = np.stack([0.03 * (b % 6) + rng.uniform(-0.2, 0.2, 256),
                      0.03 * (b // 6) + rng.uniform(-0.2, 0.2, 256),
                      np.ones(256)], -1).astype(np.float32)
        os_.append(o)
        ds_.append(d / np.linalg.norm(d, axis=-1, keepdims=True))
    o = jnp.asarray(np.concatenate(os_))
    d = jnp.asarray(np.concatenate(ds_))

    from threedgrut_tpu import constants as C
    radius = grt.bounding_radius(scale, opa, C.KERNEL_DEGREE_3DGRT)
    valid = opa >= C.MIN_ALPHA

    def run(expand):
        return grt.bundle_candidates_twolevel_flat(
            pos, radius, valid, o, d, 256, capacity=256, super_mult=16,
            super_capacity=256, flat_capacity=16384, expand_sort=expand)

    fi0, v0, ws0, we0, ovf0, vis0 = run(False)
    fi1, v1, ws1, we1, ovf1, vis1 = run(True)
    assert not bool(ovf0) and not bool(ovf1)
    np.testing.assert_array_equal(np.asarray(vis1), np.asarray(vis0))
    np.testing.assert_array_equal(np.asarray(ws1), np.asarray(ws0))
    np.testing.assert_array_equal(np.asarray(we1), np.asarray(we0))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    # Candidate ids must agree wherever valid (invalid rows are padding).
    v = np.asarray(v0)
    np.testing.assert_array_equal(np.asarray(fi1)[v], np.asarray(fi0)[v])


def test_super_lists_expand_truncation_flags_overflow():
    """Per-super s_cap truncation on the expansion path: overflow is
    flagged, per-super keep counts clamp to s_cap (lowest-id hits kept),
    and the flat layout stays aligned."""
    rng = np.random.default_rng(41)
    ns, n, s_cap, capS = 2, 96, 16, 256
    hit1 = jnp.asarray(rng.random((ns, n)) < 0.5)
    counts1 = jnp.sum(hit1.astype(jnp.int32), axis=1)
    assert int(jnp.max(counts1)) > s_cap
    fs, vs, ws, we, ovf, wsu = grt._super_lists_expand(hit1, counts1,
                                                       s_cap, capS)
    # total fits capS here, so the capS overflow flag stays False; the
    # CALLER flags counts1 > s_cap (bundle_candidates_twolevel_flat does).
    fs, vs = np.asarray(fs), np.asarray(vs)
    ws, we = np.asarray(ws), np.asarray(we)
    h = np.asarray(hit1)
    for s in range(ns):
        seg = fs[ws[s] * 128:we[s] * 128]
        segv = vs[ws[s] * 128:we[s] * 128]
        kept = seg[segv]
        assert len(kept) == s_cap
        expected = np.nonzero(h[s])[0][:s_cap]
        np.testing.assert_array_equal(kept, expected)
