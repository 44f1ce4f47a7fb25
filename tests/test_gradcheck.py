"""Finite-difference gradient checks (SURVEY §4: jax.test_util-style checks
against numerical derivatives) for the load-bearing differentiable pieces."""
import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.ops import particles as particle_ops
from threedgrut_tpu.ops.compositing import composite


def num_grad(f, x, eps=1e-3):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (f(jnp.asarray(xp, jnp.float32))
                - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        it.iternext()
    return g


def test_composite_gradcheck():
    rng = np.random.default_rng(0)
    alphas = rng.uniform(0.1, 0.6, (2, 5)).astype(np.float32)
    colors = rng.uniform(0, 1, (2, 5, 3)).astype(np.float32)
    depths = np.sort(rng.uniform(1, 5, (2, 5))).astype(np.float32)

    def loss_a(a):
        r = composite(a, jnp.asarray(colors), jnp.asarray(depths), 1e-4)
        return float(jnp.sum(r.rgb) + jnp.sum(r.depth) + jnp.sum(r.opacity))

    g_auto = jax.grad(lambda a: (lambda r: jnp.sum(r.rgb) + jnp.sum(r.depth)
                                 + jnp.sum(r.opacity))(
        composite(a, jnp.asarray(colors), jnp.asarray(depths), 1e-4)))(
        jnp.asarray(alphas))
    g_num = num_grad(loss_a, alphas)
    np.testing.assert_allclose(np.asarray(g_auto), g_num, atol=2e-2,
                               rtol=2e-2)


def test_particle_hit_gradcheck():
    rng = np.random.default_rng(1)
    pos = rng.normal(0, 0.2, 3).astype(np.float32) + [0, 0, 3]
    quat = rng.normal(size=4).astype(np.float32)
    quat /= np.linalg.norm(quat)
    scale = np.exp(rng.normal(size=3) * 0.2 - 1.2).astype(np.float32)
    o = np.zeros(3, np.float32)
    d = np.asarray([0.05, -0.03, 1.0], np.float32)
    d /= np.linalg.norm(d)

    def loss_pos(p):
        h = particle_ops.particle_hit(p, jnp.asarray(quat),
                                      jnp.asarray(scale), 0.7,
                                      jnp.asarray(o), jnp.asarray(d), 2)
        return float(h.alpha + 0.1 * h.hit_t)

    g_auto = jax.grad(lambda p: (lambda h: h.alpha + 0.1 * h.hit_t)(
        particle_ops.particle_hit(p, jnp.asarray(quat), jnp.asarray(scale),
                                  0.7, jnp.asarray(o), jnp.asarray(d), 2)))(
        jnp.asarray(pos))
    g_num = num_grad(loss_pos, pos, eps=1e-3)
    np.testing.assert_allclose(np.asarray(g_auto), g_num, atol=5e-3,
                               rtol=5e-2)


def test_ut_projection_gradcheck():
    from threedgrut_tpu.cameras import PinholeCamera, SensorPose
    from threedgrut_tpu.ops import projection as proj_ops
    cam = PinholeCamera(jnp.asarray([60.0, 60.0]), jnp.asarray([16.0, 16.0]),
                        jnp.zeros(6), jnp.zeros(2), jnp.zeros(4))
    pose = SensorPose(jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3),
                      jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3))
    rng = np.random.default_rng(2)
    pos = (rng.normal(0, 0.2, (1, 3)) + [0, 0, 3]).astype(np.float32)
    quat = rng.normal(size=(1, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat)
    scale = np.full((1, 3), 0.2, np.float32)

    def loss(p):
        c, cov, _ = proj_ops.ut_sigma_projection(
            p, jnp.asarray(quat), jnp.asarray(scale), cam, pose, 0, (32, 32))
        return float(jnp.sum(c) + jnp.sum(cov))

    g_auto = jax.grad(lambda p: (lambda t: jnp.sum(t[0]) + jnp.sum(t[1]))(
        proj_ops.ut_sigma_projection(p, jnp.asarray(quat),
                                     jnp.asarray(scale), cam, pose, 0,
                                     (32, 32))))(jnp.asarray(pos))
    g_num = num_grad(loss, pos, eps=1e-3)
    np.testing.assert_allclose(np.asarray(g_auto), g_num, atol=1e-1,
                               rtol=5e-2)
