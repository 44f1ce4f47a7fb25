"""Oracle renderer tests: against a literal per-pixel Python loop implementing
the reference CUDA semantics, plus differentiability and sanity checks."""
import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu import constants as C
from threedgrut_tpu.cameras import ShutterType, pose_from_matrix
from threedgrut_tpu.ops import projection as P
from threedgrut_tpu.ops import particles as particle_ops
from threedgrut_tpu.ops import sh as sh_ops
from threedgrut_tpu.render import gut_reference
from tests.test_cameras import IDENTITY_POSE, make_pinhole


def random_scene(n=48, seed=0, z=3.0, spread=0.4):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.normal(size=(n, 3)) * spread + [0, 0, z], jnp.float32)
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    scale = jnp.asarray(np.exp(rng.normal(size=(n, 3)) * 0.3 - 2.2), jnp.float32)
    opa = jnp.asarray(rng.uniform(0.3, 0.95, size=n), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(n, 16, 3)) * 0.3, jnp.float32)
    return pos, quat, scale, opa, feats


def brute_force_render(pos, quat, scale, opa, feats, cam, resolution,
                       sh_degree=3, kernel_degree=2):
    """Direct per-pixel Python loop mirroring gutRenderer.cu semantics."""
    w, h = resolution
    proj = P.project(pos, quat, scale, opa, cam, IDENTITY_POSE,
                     ShutterType.GLOBAL, resolution)
    depth_np = np.asarray(proj.depth)
    valid_np = np.asarray(proj.valid & (proj.n_tiles > 0))
    order = np.argsort(np.where(valid_np, depth_np, np.inf), kind="stable")

    cam_center = np.zeros(3)
    dirs = np.asarray(pos) - cam_center
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    colors = np.asarray(sh_ops.radiance_from_sh(
        sh_degree, feats, jnp.asarray(dirs), clamped=False))
    colors = np.maximum(colors, 0.0)

    from threedgrut_tpu.cameras import pinhole_camera_rays
    _, rd = pinhole_camera_rays(cam, resolution)
    rd = np.asarray(rd)

    # Precompute the alpha matrix (vectorized — the per-pair math is already
    # unit-tested elsewhere); the compositing/culling control flow below stays
    # a literal Python transcription of the CUDA loop.
    hit = particle_ops.particle_hit(
        pos[None, :, :], quat[None, :, :], scale[None, :, :], opa[None, :],
        jnp.zeros((h * w, 1, 3)), jnp.asarray(rd.reshape(-1, 3))[:, None, :],
        kernel_degree)
    alpha_mat = np.asarray(hit.alpha).reshape(h, w, -1)

    img = np.zeros((h, w, 3), np.float32)
    tmin = np.asarray(proj.tile_min)
    tmax = np.asarray(proj.tile_max)
    conic = np.asarray(proj.conic)
    center = np.asarray(proj.center)
    maxp = np.asarray(proj.max_power)
    n_tiles_x = -(-w // C.TILE_X)
    n_tiles_y = -(-h // C.TILE_Y)
    power = np.zeros((n_tiles_y, n_tiles_x, len(order)), np.float32)
    for ty in range(n_tiles_y):
        for tx in range(n_tiles_x):
            power[ty, tx] = np.asarray(P.tile_min_power_response(
                jnp.array([float(tx), float(ty)]), jnp.asarray(conic),
                jnp.asarray(center)))
    for y in range(h):
        for x in range(w):
            tx, ty = x // C.TILE_X, y // C.TILE_Y
            T = 1.0
            acc = np.zeros(3)
            for j in order:
                if not valid_np[j]:
                    break
                if not (tmin[j, 0] <= tx < tmax[j, 0]
                        and tmin[j, 1] <= ty < tmax[j, 1]):
                    continue
                if power[ty, tx, j] >= maxp[j]:
                    continue
                if T <= C.MIN_TRANSMITTANCE_3DGUT:
                    break
                a = float(alpha_mat[y, x, j])
                if a <= 0.0:
                    continue
                acc += a * T * colors[j]
                T *= 1.0 - a
            img[y, x] = acc
    return img


def test_oracle_matches_brute_force():
    pos, quat, scale, opa, feats = random_scene(n=32, seed=5)
    cam = make_pinhole(f=60.0, cx=16.0, cy=16.0)
    res = (32, 32)
    out = gut_reference.render(pos, quat, scale, opa, feats, cam,
                               IDENTITY_POSE, res)
    img_bf = brute_force_render(pos, quat, scale, opa, feats, cam, res)
    np.testing.assert_allclose(out.rgb, img_bf, atol=2e-5)


def test_nonempty_and_bounded():
    pos, quat, scale, opa, feats = random_scene(n=64, seed=1)
    cam = make_pinhole(f=60.0, cx=16.0, cy=16.0)
    out = gut_reference.render(pos, quat, scale, opa, feats, cam,
                               IDENTITY_POSE, (32, 32))
    assert float(out.opacity.max()) > 0.1
    assert bool(jnp.all(out.opacity <= 1.0 + 1e-5))
    assert bool(jnp.all(out.transmittance >= -1e-6))
    assert bool(jnp.any(out.visibility))


def test_differentiable():
    pos, quat, scale, opa, feats = random_scene(n=16, seed=2)
    cam = make_pinhole(f=60.0, cx=16.0, cy=16.0)

    def loss(pos, scale, opa, feats):
        out = gut_reference.render(pos, quat, scale, opa, feats, cam,
                                   IDENTITY_POSE, (16, 16))
        return jnp.sum(out.rgb ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(pos, scale, opa, feats)
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
    assert float(jnp.abs(g[0]).max()) > 0


def test_posed_camera():
    # Put the camera at +z looking back toward origin.
    pos, quat, scale, opa, feats = random_scene(n=32, seed=3, z=0.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)  # look along -z
    T[2, 3] = 3.0
    pose = pose_from_matrix(jnp.asarray(T))
    cam = make_pinhole(f=60.0, cx=16.0, cy=16.0)
    out = gut_reference.render(pos, quat, scale, opa, feats, cam, pose,
                               (32, 32), T_to_world=jnp.asarray(T))
    assert float(out.opacity.max()) > 0.1


def test_per_ray_sorted_mode():
    """Sorted mode composites in exact per-ray hit order; for scenes with
    depth-order inversions it differs from global-z, and its per-ray ordering
    matches the 3DGRT trace path's compositing semantics."""
    from threedgrut_tpu.render import gut_reference
    pos, quat, scale, opa, feats = random_scene(n=48, seed=21, spread=0.6)
    cam = make_pinhole(f=60.0, cx=16.0, cy=16.0)
    res_u = gut_reference.render(pos, quat, scale, opa, feats, cam,
                                 IDENTITY_POSE, (32, 32))
    res_s = gut_reference.render(pos, quat, scale, opa, feats, cam,
                                 IDENTITY_POSE, (32, 32),
                                 per_ray_sorted=True)
    # Same total energy scale but not identical images.
    assert not np.allclose(np.asarray(res_u.rgb), np.asarray(res_s.rgb),
                           atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_s.opacity),
                               np.asarray(res_u.opacity), atol=0.2)
