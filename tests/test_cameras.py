"""Camera model tests: projection round trips and shutter behaviour."""
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu import cameras as cm


def make_pinhole(f=100.0, cx=32.0, cy=32.0, dist=False):
    return cm.PinholeCamera(
        focal=jnp.array([f, f]),
        principal=jnp.array([cx, cy]),
        radial=jnp.array([0.1, -0.05, 0.01, 0.0, 0.0, 0.0]) if dist else jnp.zeros(6),
        tangential=jnp.array([0.001, -0.002]) if dist else jnp.zeros(2),
        thin_prism=jnp.zeros(4),
    )


def make_fisheye(f=40.0, cx=32.0, cy=32.0):
    return cm.FisheyeCamera(
        focal=jnp.array([f, f]),
        principal=jnp.array([cx, cy]),
        radial=jnp.array([0.05, -0.01, 0.002, 0.0]),
        max_angle=jnp.array(1.5),
    )


IDENTITY_POSE = cm.SensorPose(
    q_start=jnp.array([1.0, 0.0, 0.0, 0.0]), t_start=jnp.zeros(3),
    q_end=jnp.array([1.0, 0.0, 0.0, 0.0]), t_end=jnp.zeros(3))


class TestPinhole:
    def test_center_projection(self):
        cam = make_pinhole()
        uv, valid = cm.project_point_pinhole(cam, (64, 64),
                                             jnp.array([0.0, 0.0, 2.0]), 0.1)
        np.testing.assert_allclose(uv, [32.0, 32.0], atol=1e-5)
        assert bool(valid)

    def test_ideal_projection(self):
        cam = make_pinhole()
        uv, valid = cm.project_point_pinhole(
            cam, (64, 64), jnp.array([0.1, -0.2, 1.0]), 0.1)
        np.testing.assert_allclose(uv, [32.0 + 10.0, 32.0 - 20.0], atol=1e-4)

    def test_behind_camera_invalid(self):
        cam = make_pinhole()
        uv, valid = cm.project_point_pinhole(
            cam, (64, 64), jnp.array([0.0, 0.0, -1.0]), 0.1)
        assert not bool(valid)
        np.testing.assert_allclose(uv, [0.0, 0.0])

    def test_rays_project_back(self):
        cam = make_pinhole()
        res = (16, 12)
        o, d = cm.pinhole_camera_rays(cam, res)
        pts = d * 3.0  # camera-space points along each ray
        uv, valid = cm.project_point_pinhole(cam, res, pts.reshape(-1, 3), 0.1)
        xs, ys = np.meshgrid(np.arange(16) + 0.5, np.arange(12) + 0.5)
        expected = np.stack([xs.ravel(), ys.ravel()], -1)
        np.testing.assert_allclose(uv, expected, atol=1e-3)
        assert bool(jnp.all(valid))

    def test_distorted_matches_opencv(self):
        import cv2
        cam = make_pinhole(dist=True)
        pts = np.array([[0.05, 0.1, 1.0], [-0.1, 0.02, 2.0], [0.2, -0.15, 1.5]],
                       np.float32)
        K = np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1]])
        dist = np.array([0.1, -0.05, 0.001, -0.002, 0.01])  # k1 k2 p1 p2 k3
        exp, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K, dist)
        uv, valid = cm.project_point_pinhole(cam, (64, 64),
                                             jnp.asarray(pts), 10.0)
        np.testing.assert_allclose(uv, exp[:, 0, :], atol=1e-3)


class TestFisheye:
    def test_rays_project_back(self):
        cam = make_fisheye()
        res = (16, 12)
        o, d = cm.fisheye_camera_rays(cam, res)
        pts = d.reshape(-1, 3) * 2.0
        uv, valid = cm.project_point_fisheye(cam, res, pts, 0.1)
        xs, ys = np.meshgrid(np.arange(16) + 0.5, np.arange(12) + 0.5)
        expected = np.stack([xs.ravel(), ys.ravel()], -1)
        np.testing.assert_allclose(uv, expected, atol=1e-2)

    def test_matches_opencv(self):
        import cv2
        cam = make_fisheye()
        pts = np.array([[0.3, 0.2, 1.0], [-0.5, 0.1, 0.8]], np.float32)
        K = np.array([[40.0, 0, 32.0], [0, 40.0, 32.0], [0, 0, 1]])
        D = np.array([0.05, -0.01, 0.002, 0.0])
        exp, _ = cv2.fisheye.projectPoints(
            pts.reshape(1, -1, 3).astype(np.float64), np.zeros(3), np.zeros(3),
            K, D)
        uv, valid = cm.project_point_fisheye(cam, (64, 64), jnp.asarray(pts), 10.0)
        np.testing.assert_allclose(uv, exp[0], atol=1e-3)


class TestShutter:
    def test_global_matches_plain(self):
        cam = make_pinhole()
        p = jnp.array([0.3, -0.1, 2.0])
        uv1, v1 = cm.project_point_with_shutter(
            cam, IDENTITY_POSE, cm.ShutterType.GLOBAL, (64, 64), p, 0.1)
        uv2, v2 = cm.project_point_pinhole(cam, (64, 64), p, 0.1)
        np.testing.assert_allclose(uv1, uv2, atol=1e-6)

    def test_rolling_interpolates(self):
        cam = make_pinhole()
        # End pose shifted along +x: world point appears shifted in camera x.
        pose = cm.SensorPose(
            q_start=jnp.array([1.0, 0.0, 0.0, 0.0]), t_start=jnp.zeros(3),
            q_end=jnp.array([1.0, 0.0, 0.0, 0.0]), t_end=jnp.array([0.5, 0.0, 0.0]))
        p = jnp.array([0.0, 0.3, 2.0])  # projects below center -> later shutter row
        uv, valid = cm.project_point_with_shutter(
            cam, pose, cm.ShutterType.ROLLING_TOP_TO_BOTTOM, (64, 64), p, 0.1)
        uv_start, _ = cm.project_point_pinhole(cam, (64, 64), p, 0.1)
        assert bool(valid)
        # Row ~47/63 of the way down -> x shifted right by ~0.74 * 0.5/2 * 100 px.
        assert float(uv[0]) > float(uv_start[0]) + 10.0

    def test_pose_from_matrix_roundtrip(self):
        rng = np.random.default_rng(4)
        from scipy.spatial.transform import Rotation
        R = Rotation.random(random_state=3).as_matrix().astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        pose = cm.pose_from_matrix(jnp.asarray(T))
        # A world point through the pose should equal the matrix inverse transform.
        p_world = jnp.asarray(rng.normal(size=3), jnp.float32)
        p_cam = cm.transform_to_camera(pose.q_start, pose.t_start, p_world)
        expected = R.T @ (np.asarray(p_world) - t)
        np.testing.assert_allclose(p_cam, expected, atol=1e-4)
