"""UT projection tests against analytic expectations."""
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu import constants as C
from threedgrut_tpu.ops import projection as P
from tests.test_cameras import IDENTITY_POSE, make_pinhole
from threedgrut_tpu.cameras import ShutterType


def test_tiny_particle_projects_to_point():
    cam = make_pinhole(f=100.0, cx=32.0, cy=32.0)
    pos = jnp.array([[0.1, -0.05, 2.0]])
    quat = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scale = jnp.full((1, 3), 1e-4)
    center, cov, valid = P.ut_sigma_projection(
        pos, quat, scale, cam, IDENTITY_POSE, ShutterType.GLOBAL, (64, 64))
    np.testing.assert_allclose(center[0], [32.0 + 5.0, 32.0 - 2.5], atol=1e-2)
    assert bool(valid[0])
    assert float(jnp.abs(cov).max()) < 1e-3


def test_ut_cov_matches_linearization():
    # For a pinhole camera (mildly nonlinear), UT covariance of an isotropic
    # Gaussian should be close to J Sigma J^T with J = diag(f/z) - mean/z.
    cam = make_pinhole(f=100.0)
    z = 4.0
    s = 0.05
    pos = jnp.array([[0.2, 0.1, z]])
    quat = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scale = jnp.full((1, 3), s)
    center, cov, valid = P.ut_sigma_projection(
        pos, quat, scale, cam, IDENTITY_POSE, ShutterType.GLOBAL, (64, 64))
    f = 100.0
    x, y = 0.2, 0.1
    J = np.array([[f / z, 0.0, -f * x / z**2],
                  [0.0, f / z, -f * y / z**2]])
    Sigma = np.eye(3) * s * s
    expected = J @ Sigma @ J.T
    np.testing.assert_allclose(
        np.array([cov[0, 0], cov[0, 1], cov[0, 2]]),
        [expected[0, 0], expected[0, 1], expected[1, 1]], rtol=0.05, atol=1e-4)


def test_conic_inverse_of_dilated_cov():
    cov = jnp.array([[2.0, 0.3, 1.5]])
    opacity = jnp.array([0.9])
    conic, comp_op, extent, max_power, valid = P.conic_extent_opacity(cov, opacity)
    M = np.array([[2.0 + C.COVARIANCE_DILATION, 0.3],
                  [0.3, 1.5 + C.COVARIANCE_DILATION]])
    Minv = np.linalg.inv(M)
    np.testing.assert_allclose(conic[0], [Minv[0, 0], Minv[0, 1], Minv[1, 1]],
                               rtol=1e-5)
    assert bool(valid[0])
    # Mip-splatting compensation shrinks opacity.
    assert float(comp_op[0]) < 0.9


def test_low_opacity_invalid():
    cov = jnp.array([[1.0, 0.0, 1.0]])
    conic, comp_op, extent, max_power, valid = P.conic_extent_opacity(
        cov, jnp.array([1e-4]))
    assert not bool(valid[0])


def test_tile_bbox():
    center = jnp.array([[24.5, 8.5]])  # pixel coords
    extent = jnp.array([[10.0, 4.0]])
    tmin, tmax, n = P.tile_bbox(center, extent, (4, 4))
    # x: (24.5-0.5-10)/16=0.875 -> 0 ; (24.5-0.5+10)/16=2.125 -> ceil 3
    # y: (8.5-0.5-4)/16=0.25 -> 0 ; (8.5-0.5+4)/16=0.75 -> ceil 1
    assert tuple(np.asarray(tmin[0])) == (0, 0)
    assert tuple(np.asarray(tmax[0])) == (3, 1)
    assert int(n[0]) == 3


def test_tile_power_response_zero_inside():
    conic = jnp.array([0.1, 0.0, 0.1])
    center = jnp.array([24.0, 8.0])  # inside tile (1, 0)
    p_in = P.tile_min_power_response(jnp.array([1.0, 0.0]), conic, center)
    assert float(p_in) == 0.0
    p_out = P.tile_min_power_response(jnp.array([3.0, 0.0]), conic, center)
    assert float(p_out) > 0.0


def test_full_project_pipeline():
    rng = np.random.default_rng(11)
    n = 64
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 0.3 + [0, 0, 3.0], jnp.float32)
    quat = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)), jnp.float32)
    scale = jnp.full((n, 3), 0.05)
    opa = jnp.full((n,), 0.8)
    cam = make_pinhole()
    proj = P.project(pos, quat, scale, opa, cam, IDENTITY_POSE,
                     ShutterType.GLOBAL, (64, 64))
    assert bool(jnp.any(proj.valid))
    assert bool(jnp.all(proj.depth[proj.valid] > 0))
    assert bool(jnp.all(proj.n_tiles >= 0))
    # behind-camera particle is invalid
    pos2 = pos.at[0, 2].set(-3.0)
    proj2 = P.project(pos2, quat, scale, opa, cam, IDENTITY_POSE,
                      ShutterType.GLOBAL, (64, 64))
    assert not bool(proj2.valid[0])
