"""Capture a Perfetto/XProf trace of the training step (the NVTX/nsight
analogue, SURVEY §5.1).

    python tools/profile_step.py [out_dir]

Open the resulting trace in xprof/tensorboard or ui.perfetto.dev.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))


def main(out_dir: str = "/tmp/jax_trace"):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from threedgrut_tpu.config import Config
    from threedgrut_tpu.model import gaussians as G
    from threedgrut_tpu.trainer import _register_cfg, _step_impl
    from threedgrut_tpu.cameras import PinholeCamera
    from threedgrut_tpu.datasets.dataset_synthetic import look_at

    n, res, cap = 1_000_000, (800, 800), 3369728
    rng = np.random.default_rng(0)
    params = G.from_arrays(
        rng.normal(0, 1.0, (n, 3)).astype(np.float32),
        rng.normal(size=(n, 4)).astype(np.float32),
        np.log(np.exp(rng.uniform(np.log(0.004), np.log(0.02),
                                  (n, 3)))).astype(np.float32),
        np.zeros((n, 1), np.float32),
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        np.zeros((n, 45), np.float32))
    from threedgrut_tpu import optimizers
    opt = optimizers.init(params)
    cfg = Config()
    cfg_key = _register_cfg(cfg)
    w, h = res
    f = 0.9 * w
    cam = PinholeCamera(jnp.asarray([f, f]), jnp.asarray([w / 2, h / 2]),
                        jnp.zeros(6), jnp.zeros(2), jnp.zeros(4))
    T = jnp.asarray(look_at(np.array([0., -4., 1.], np.float32),
                            np.zeros(3, np.float32),
                            np.array([0., 0., 1.], np.float32)))
    gt = jnp.zeros((h, w, 3))
    mask = jnp.ones((h, w, 1))
    key = jax.random.PRNGKey(0)

    def step(p, o):
        return _step_impl(p, o, T, cam, gt, mask, key, jnp.float32(4.0),
                          res, 3, cfg_key, train=True, isect_capacity=cap)

    p, o, aux = step(params, opt)   # compile outside the trace
    np.asarray(p.positions[:1])
    with jax.profiler.trace(out_dir):
        for _ in range(3):
            p, o, aux = step(p, o)
        np.asarray(p.positions[:1])
    print(f"trace written to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace")
