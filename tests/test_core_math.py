"""Golden tests for the core particle math against analytically-computed values."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedgrut_tpu import constants as C
from threedgrut_tpu.ops import particles, quaternion, sh
from threedgrut_tpu.ops.compositing import composite


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(quaternion.to_rotation_matrix(q), np.eye(3),
                                   atol=1e-6)

    def test_z_rotation(self):
        # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45).
        a = np.pi / 4
        q = jnp.array([np.cos(a), 0.0, 0.0, np.sin(a)])
        R = quaternion.to_rotation_matrix(q)
        expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(0)
        q = quaternion.normalize(jnp.asarray(rng.normal(size=(10, 4)), jnp.float32))
        v = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
        R = quaternion.to_rotation_matrix(q)
        np.testing.assert_allclose(quaternion.rotate(q, v),
                                   jnp.einsum("nij,nj->ni", R, v), atol=1e-5)

    def test_orthonormal(self):
        rng = np.random.default_rng(1)
        q = quaternion.normalize(jnp.asarray(rng.normal(size=(32, 4)), jnp.float32))
        R = quaternion.to_rotation_matrix(q)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)),
                                   atol=1e-5)

    def test_slerp_endpoints(self):
        rng = np.random.default_rng(2)
        q0 = quaternion.normalize(jnp.asarray(rng.normal(size=4), jnp.float32))
        q1 = quaternion.normalize(jnp.asarray(rng.normal(size=4), jnp.float32))
        np.testing.assert_allclose(quaternion.slerp(q0, q1, jnp.array(0.0)), q0,
                                   atol=1e-5)
        s1 = quaternion.slerp(q0, q1, jnp.array(1.0))
        assert (np.allclose(s1, q1, atol=1e-5) or np.allclose(s1, -q1, atol=1e-5))


class TestSH:
    def test_deg0_constant(self):
        coeffs = jnp.ones((1, 3)) * 2.0
        dirs = jnp.array([0.0, 0.0, 1.0])
        rad = sh.radiance_from_sh(0, coeffs, dirs)
        np.testing.assert_allclose(rad, 2.0 * C.SH_C0 + 0.5, rtol=1e-6)

    def test_deg1_signs(self):
        # Reference degree-1 term: -C1*y*f1 + C1*z*f2 - C1*x*f3.
        coeffs = jnp.zeros((4, 3)).at[1, 0].set(1.0)
        dirs = jnp.array([0.0, 1.0, 0.0])  # y
        rad = sh.radiance_from_sh(1, coeffs, dirs, clamped=False)
        np.testing.assert_allclose(rad[0], -C.SH_C1 + 0.5, rtol=1e-5)

    def test_clamp(self):
        coeffs = jnp.zeros((1, 3)).at[0].set(-100.0)
        rad = sh.radiance_from_sh(0, coeffs, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(rad, 0.0)

    def test_progressive_ignores_tail(self):
        rng = np.random.default_rng(3)
        coeffs = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        dirs = jnp.array([0.6, 0.0, 0.8])
        r1 = sh.radiance_from_sh(1, coeffs, dirs)
        r1b = sh.radiance_from_sh(1, coeffs.at[4:].set(0.0), dirs)
        np.testing.assert_allclose(r1, r1b, rtol=1e-6)

    def test_basis_count(self):
        dirs = jnp.array([0.0, 0.0, 1.0])
        for deg in range(4):
            assert sh.sh_basis(deg, dirs).shape[-1] == (deg + 1) ** 2


class TestResponse:
    @pytest.mark.parametrize("degree", [0, 1, 2, 3, 4, 5, 8])
    def test_response_at_zero_is_one(self, degree):
        np.testing.assert_allclose(
            particles.kernel_response(jnp.array(0.0), degree), 1.0, atol=1e-6)

    @pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 8])
    def test_response_at_three_sigma(self, degree):
        # s_n = -4.5/3^n; at d = 9 (3 sigma squared), d^(n/2) = 3^n, so
        # response = exp(-4.5) for every degree.
        np.testing.assert_allclose(
            particles.kernel_response(jnp.array(9.0), degree),
            np.exp(-4.5), rtol=1e-4)

    def test_canonical_ray_unit_sphere(self):
        # Identity particle at origin: ray along +z offset by (1, 0): dist^2 = 1.
        hit = particles.particle_hit(
            jnp.zeros(3), jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.ones(3),
            jnp.array(1.0), jnp.array([1.0, 0.0, -5.0]),
            jnp.array([0.0, 0.0, 1.0]), kernel_degree=2)
        np.testing.assert_allclose(hit.response, np.exp(-0.5), rtol=1e-5)
        # Depth: projection of center on ray = 5.
        np.testing.assert_allclose(hit.hit_t, 5.0, rtol=1e-5)

    def test_scaled_particle(self):
        # Scale (2,1,1): ray along +z at x=2 is 1 canonical unit away.
        hit = particles.particle_hit(
            jnp.zeros(3), jnp.array([1.0, 0.0, 0.0, 0.0]),
            jnp.array([2.0, 1.0, 1.0]), jnp.array(1.0),
            jnp.array([2.0, 0.0, -4.0]), jnp.array([0.0, 0.0, 1.0]),
            kernel_degree=2)
        np.testing.assert_allclose(hit.response, np.exp(-0.5), rtol=1e-5)

    def test_rotated_particle(self):
        # 90deg about z maps canonical x-axis to world y: scale (3,1,1) means
        # a ray offset along world y by 3 has canonical distance 1.
        a = np.pi / 4
        q = jnp.array([np.cos(a), 0.0, 0.0, np.sin(a)])
        hit = particles.particle_hit(
            jnp.zeros(3), q, jnp.array([3.0, 1.0, 1.0]), jnp.array(1.0),
            jnp.array([0.0, 3.0, -4.0]), jnp.array([0.0, 0.0, 1.0]),
            kernel_degree=2)
        np.testing.assert_allclose(hit.response, np.exp(-0.5), rtol=1e-4)

    def test_alpha_clamp_and_accept(self):
        hit = particles.particle_hit(
            jnp.zeros(3), jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.ones(3),
            jnp.array(5.0), jnp.zeros(3).at[2].set(-5.0),
            jnp.array([0.0, 0.0, 1.0]), kernel_degree=2)
        np.testing.assert_allclose(hit.alpha, C.MAX_ALPHA)
        # Far ray: reject.
        miss = particles.particle_hit(
            jnp.zeros(3), jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.ones(3),
            jnp.array(1.0), jnp.array([10.0, 0.0, -5.0]),
            jnp.array([0.0, 0.0, 1.0]), kernel_degree=2)
        assert not bool(miss.accept)
        np.testing.assert_allclose(miss.alpha, 0.0)

    def test_gradients_flow(self):
        def loss(pos):
            hit = particles.particle_hit(
                pos, jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.ones(3),
                jnp.array(0.8), jnp.array([0.5, 0.0, -5.0]),
                jnp.array([0.0, 0.0, 1.0]), kernel_degree=2)
            return hit.alpha
        g = jax.grad(loss)(jnp.zeros(3))
        assert np.all(np.isfinite(g))
        assert abs(g[0]) > 0  # moving toward the ray raises alpha


class TestCompositing:
    def test_single_hit(self):
        res = composite(jnp.array([0.5]), jnp.array([[1.0, 0.0, 0.0]]),
                        jnp.array([2.0]), 1e-4)
        np.testing.assert_allclose(res.rgb, [0.5, 0.0, 0.0], rtol=1e-6)
        np.testing.assert_allclose(res.transmittance, 0.5, rtol=1e-6)
        np.testing.assert_allclose(res.depth, 1.0, rtol=1e-6)

    def test_matches_sequential_loop(self):
        rng = np.random.default_rng(7)
        k = 50
        alphas = jnp.asarray(rng.uniform(0, 0.9, size=k), jnp.float32)
        colors = jnp.asarray(rng.uniform(0, 1, size=(k, 3)), jnp.float32)
        depths = jnp.asarray(rng.uniform(0, 10, size=k), jnp.float32)
        res = composite(alphas, colors, depths, 1e-4)
        # Sequential reference (the CUDA loop semantics).
        T, rgb, dep = 1.0, np.zeros(3), 0.0
        for i in range(k):
            if T <= 1e-4:
                break
            w = float(alphas[i]) * T
            rgb += w * np.asarray(colors[i])
            dep += w * float(depths[i])
            T *= 1.0 - float(alphas[i])
        np.testing.assert_allclose(res.rgb, rgb, rtol=1e-4)
        np.testing.assert_allclose(res.depth, dep, rtol=1e-4)
        np.testing.assert_allclose(res.transmittance, T, rtol=1e-4)

    def test_early_termination(self):
        # First hit nearly opaque: T after = 0.01 > 1e-4 -> second processed;
        # chain of opaque hits drives T below threshold and stops processing.
        alphas = jnp.array([0.99] * 3 + [0.5])
        colors = jnp.ones((4, 3))
        depths = jnp.ones(4)
        res = composite(alphas, colors, depths, 1e-3)
        # T before hit 3 = 0.01^... : 1e-2, 1e-4, 1e-6: hits 0,1,2? T2=1e-4 < 1e-3 stop.
        assert int(res.hit_count) == 2

    def test_batched(self):
        alphas = jnp.zeros((4, 7, 3)).at[..., 0].set(0.3)
        colors = jnp.ones((4, 7, 3, 3))
        depths = jnp.ones((4, 7, 3))
        res = composite(alphas, colors, depths, 1e-4)
        assert res.rgb.shape == (4, 7, 3)
        np.testing.assert_allclose(res.opacity, 0.3, rtol=1e-6)

    def test_gradient_matches_sequential(self):
        rng = np.random.default_rng(9)
        k = 12
        alphas0 = jnp.asarray(rng.uniform(0.05, 0.6, size=k), jnp.float32)
        colors = jnp.asarray(rng.uniform(0, 1, size=(k, 3)), jnp.float32)
        depths = jnp.asarray(rng.uniform(0, 10, size=k), jnp.float32)

        def loss_ours(a):
            return jnp.sum(composite(a, colors, depths, 1e-4).rgb)

        def loss_seq(a):
            T = jnp.array(1.0)
            rgb = jnp.zeros(3)
            for i in range(k):
                w = a[i] * T
                rgb = rgb + w * colors[i]
                T = T * (1 - a[i])
            return jnp.sum(rgb)

        g0 = jax.grad(loss_ours)(alphas0)
        g1 = jax.grad(loss_seq)(alphas0)
        np.testing.assert_allclose(g0, g1, rtol=1e-3)
