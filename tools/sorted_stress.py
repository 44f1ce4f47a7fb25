"""Sorted ("k-buffer") mode stress at scale — VERDICT r2 item 7.

Builds an inversion-heavy scene with >=10k particles (dense clusters of
near-equal depth, strongly tilted pancakes: per-ray hit order inverts
against the global z order, often across window boundaries), renders the
fast path at sorted_passes P in {0, 8, 16, 32}, and reports the error vs
the exact per-ray-sorted oracle (gut_reference.render(per_ray_sorted=True))
plus the per-frame step cost of each P.

The bounded-displacement approximation must degrade gracefully: error
monotone non-increasing in P. Reference semantics: the k=16 insertion
buffer of gutKBufferRenderer.cuh:28-85 is itself approximate for
displacements > 16 — P=16 here matches that contract.

    python tools/sorted_stress.py            # TPU (or CPU, tiny + slow)

Writes runs/sorted_stress.json and prints a summary.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def inversion_scene(n, seed=3):
    """Clustered near-equal-z tilted pancakes; ~60 deg tilts give per-ray
    hit-order displacements up to the cluster depth (24: beyond P=16's
    bound, within P=32's except across 256-window straddles), so the P
    sweep spans partially-fixed to nearly-exact — the regime where the
    bounded-displacement design must degrade gracefully."""
    rng = np.random.default_rng(seed)
    n_cluster = 24
    n_c = n // n_cluster
    cz = rng.uniform(2.0, 6.0, n_c)
    cxy = rng.uniform(-1.4, 1.4, (n_c, 2)) * (cz[:, None] / 3.0)
    pos = np.zeros((n, 3), np.float32)
    for i in range(n_c):
        s = slice(i * n_cluster, (i + 1) * n_cluster)
        # Near-ties in z: shuffled 1e-3 spacing within the cluster.
        pos[s, 2] = cz[i] + 1e-3 * rng.permutation(n_cluster)
        pos[s, :2] = cxy[i] + rng.uniform(-0.12, 0.12, (n_cluster, 2))
    t = rng.uniform(-1.05, 1.05, n)          # tilt about random xy axis
    ax = rng.normal(size=(n, 2))
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    quat = np.stack([np.cos(t / 2), np.sin(t / 2) * ax[:, 0],
                     np.sin(t / 2) * ax[:, 1], np.zeros(n)],
                    -1).astype(np.float32)
    scale = np.stack([rng.uniform(0.06, 0.20, n), rng.uniform(0.06, 0.20, n),
                      np.full(n, 0.002)], -1).astype(np.float32)
    opa = rng.uniform(0.3, 0.9, n).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.5, 1.5, (n, 3))
    return pos, quat, scale, opa, feats


def main():
    import jax
    import jax.numpy as jnp
    from threedgrut_tpu.cameras import PinholeCamera, SensorPose
    from threedgrut_tpu.render import gut, gut_reference

    on_tpu = jax.default_backend() == "tpu"
    # Oracle memory bound: gut_reference materializes [pixels, N] temps
    # (128x128 x 12288 = 768 MB/temp); keep pixels*N under ~2e9/4.
    n = 12_288 if on_tpu else 768
    res = (128, 128) if on_tpu else (32, 32)
    cap = 1 << 21 if on_tpu else 1 << 14
    f = 110.0 if on_tpu else 28.0
    cam = PinholeCamera(
        focal=jnp.array([f, f]),
        principal=jnp.array([res[0] / 2.0, res[1] / 2.0]),
        radial=jnp.zeros(6), tangential=jnp.zeros(2),
        thin_prism=jnp.zeros(4))
    pose = SensorPose(
        q_start=jnp.array([1.0, 0.0, 0.0, 0.0]), t_start=jnp.zeros(3),
        q_end=jnp.array([1.0, 0.0, 0.0, 0.0]), t_end=jnp.zeros(3))

    pos, quat, scale, opa, feats = inversion_scene(n)
    args = tuple(jnp.asarray(x) for x in (pos, quat, scale, opa, feats))

    ref = jax.jit(lambda *a: gut_reference.render(
        *a, cam, pose, res, per_ray_sorted=True))(*args)
    ref_rgb = np.asarray(ref.rgb)

    out = {"n": n, "resolution": list(res),
           "backend": jax.default_backend(), "legs": []}
    prev_err = None
    for P in (0, 8, 16, 32):
        fn = jax.jit(lambda *a, P=P: gut.render(
            *a, cam, pose, res, cap, sorted_passes=P))
        o_, ovf = fn(*args)
        np.asarray(o_.rgb[:1, :1])
        assert not bool(ovf), f"capacity overflow at P={P}"
        iters = 10 if on_tpu else 1
        t0 = time.perf_counter()
        for _ in range(iters):
            o_, _ = fn(*args)
        np.asarray(o_.rgb[:1, :1])
        ms = (time.perf_counter() - t0) / iters * 1000
        rgb = np.asarray(o_.rgb)
        err = np.abs(rgb - ref_rgb)
        leg = {"passes": P, "max_abs_err": float(err.max()),
               "mean_abs_err": float(err.mean()),
               "frame_ms": round(ms, 2)}
        out["legs"].append(leg)
        print(leg, flush=True)
        if prev_err is not None:
            # Graceful degradation: MEAN error monotone non-increasing in P
            # (max error is a single worst pixel — window-boundary straddle
            # cases keep it noisy by design; the mean is the contract).
            assert leg["mean_abs_err"] <= prev_err * 1.02 + 1e-6, (
                f"error NOT monotone at P={P}: {leg['mean_abs_err']} "
                f"vs {prev_err}")
        prev_err = leg["mean_abs_err"]
    # P=32 covers the 24-deep clusters (minus window straddles): the sweep
    # must show real convergence toward the oracle, not flat error.
    assert out["legs"][-1]["mean_abs_err"] < 0.5 * out["legs"][0][
        "mean_abs_err"], out["legs"]

    os.makedirs("/root/repo/runs", exist_ok=True)
    with open("/root/repo/runs/sorted_stress.json", "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print("OK — monotone degradation, results in runs/sorted_stress.json")


if __name__ == "__main__":
    main()
