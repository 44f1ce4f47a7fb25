"""Compile-probe the scale-proof train step (capacity 2^20 params,
isect 2^21, 800x800) without touching the checkpoint — catches the XLA
layout pathology that OOM'd run2's compile before committing hours to it."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from threedgrut_tpu import optimizers
    from threedgrut_tpu.config import Config
    from threedgrut_tpu.datasets.dataset_synthetic import look_at
    from threedgrut_tpu.model import gaussians as G
    from threedgrut_tpu.trainer import _register_cfg, _step_impl
    from __graft_entry__ import _example_camera

    n_active, cap_model = 91_000, 1 << 20
    res, isect_cap = (800, 800), 1 << 21
    rng = np.random.default_rng(0)
    params = G.from_arrays(
        rng.normal(0, 1.0, (n_active, 3)).astype(np.float32),
        rng.normal(size=(n_active, 4)).astype(np.float32),
        rng.uniform(np.log(0.004), np.log(0.02),
                    (n_active, 3)).astype(np.float32),
        np.zeros((n_active, 1), np.float32),
        rng.uniform(-1, 1, (n_active, 3)).astype(np.float32),
        np.zeros((n_active, 45), np.float32),
        capacity=cap_model)
    opt = optimizers.init(params)

    cfg = Config()
    cfg.render.isect_capacity = isect_cap
    cfg.model.background_color = "white"
    cfg_key = _register_cfg(cfg)

    cam = _example_camera(res)
    T = jnp.asarray(look_at(np.array([0., -4.0, 1.0], np.float32),
                            np.zeros(3, np.float32),
                            np.array([0., 0., 1.], np.float32)))
    gt = jnp.zeros((res[1], res[0], 3), jnp.float32)
    mask = jnp.ones((res[1], res[0], 1), jnp.float32)

    p, o, aux = _step_impl(params, opt, T, cam, gt, mask,
                           jax.random.PRNGKey(0), jnp.float32(4.8), res, 3,
                           cfg_key, train=True, isect_capacity=isect_cap)
    np.asarray(p.positions[:1])
    print("scale-step compile ok; overflow =", bool(aux["overflow"]),
          flush=True)


if __name__ == "__main__":
    main()
