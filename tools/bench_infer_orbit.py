"""Inference orbit benchmark: exact vs temporally-compacted render paths.

Renders F frames of a camera orbit over the 1M-Gaussian bench scene
(bench.py's scene/capacities) three ways:

  exact    every frame pays the full pipeline (BENCH_INFER's path)
  compact  refresh (exact + hit-visibility census + compaction) every K
           frames; frames between render the compacted visible set at a
           proportionally smaller isect capacity (render/infer.py)
  frozen   like compact, but frames between ALSO reuse the refresh frame's
           binning verbatim (pack + gather + kernel only)

and reports ms/frame per mode plus per-frame PSNR of the approximate modes
against the exact frames (the parity bound VERDICT r4 #1 asks for).

    python tools/bench_infer_orbit.py            # ~5 min on the chip
    ORBIT_DEG=1.0 ORBIT_K=4 python tools/bench_infer_orbit.py

Timing note (CLAUDE.md): frames chain through a carry scalar inside each
timed loop; ONE tiny readback fences the loop.
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from threedgrut_tpu.cameras import pose_from_matrix
    from threedgrut_tpu.datasets.dataset_synthetic import look_at
    from threedgrut_tpu.model import gaussians as G
    from threedgrut_tpu.render import gut, infer
    from __graft_entry__ import _example_camera

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        n, res, cap = 1_000_000, (800, 800), 2917888
        F = int(os.environ.get("ORBIT_F", "32"))
    else:
        n, res, cap = 2_000, (64, 64), 1 << 13
        F = 6
    K = int(os.environ.get("ORBIT_K", "8"))
    deg = float(os.environ.get("ORBIT_DEG", "0.5"))
    sorted_frozen = int(os.environ.get("ORBIT_SORTED", "16"))
    vis_t = float(os.environ.get("ORBIT_VIS_T", "0.0"))

    rng = np.random.default_rng(0)
    pos = rng.normal(0, 1.0, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.exp(rng.uniform(np.log(0.004), np.log(0.02),
                                size=(n, 3))).astype(np.float32)
    opac = np.full((n,), 0.5, np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(0.0, 1.0, size=(n, 3))
    P = tuple(jnp.asarray(x) for x in (pos, quats, scales, opac, feats))
    cam = _example_camera(res)

    def orbit_T(i):
        a = math.radians(deg) * i
        eye = np.array([4.0 * math.sin(a), -4.0 * math.cos(a), 1.0],
                       np.float32)
        return jnp.asarray(look_at(eye, np.zeros(3, np.float32),
                                   np.array([0., 0., 1.], np.float32)))

    Ts = [orbit_T(i) for i in range(F)]
    h, w = res[1], res[0]

    # ---- probe: visible fraction + compact capacities --------------------
    @jax.jit
    def probe(T):
        out, ovf = gut.render(*P, cam, pose_from_matrix(T), res, cap,
                              sh_degree=3, T_to_world=T,
                              hit_visibility=True, aux_gradients=False,
                              visibility_threshold=vis_t)
        return jnp.sum(out.visibility.astype(jnp.int32)), ovf

    nvis, _ = probe(Ts[0])
    nvis = int(nvis)
    gran = 4096 if on_tpu else 256
    n_c = -(-int(nvis * 1.2) // gran) * gran

    @jax.jit
    def probe_cap(T):
        from threedgrut_tpu.ops import projection as proj_ops
        from threedgrut_tpu.ops import tiles as tile_ops
        out, ovf, scene = infer.refresh(*P, cam, pose_from_matrix(T), res,
                                        cap, n_c, sh_degree=3, T_to_world=T,
                                        visibility_threshold=vis_t)
        wp, hp = gut.pad_to_tiles(res)
        proj = proj_ops.project(scene.positions, scene.quats, scene.scales,
                                scene.opacities, cam, pose_from_matrix(T),
                                0, res)
        b = tile_ops.bin_particles(proj, (wp // 16, hp // 16), cap)
        return b.num_intersections, scene.overflow

    nisect, sovf = probe_cap(Ts[0])
    cap_c = -(-int(int(nisect) * 1.2) // 256) * 256
    print(f"visible {nvis}/{n} -> n_compact {n_c}; "
          f"compact isect {int(nisect)} -> cap_c {cap_c} "
          f"(full cap {cap}); compact_overflow {bool(sovf)}", flush=True)

    # ---- jitted stages ---------------------------------------------------
    frames = jnp.zeros((3, F, h, w, 3), jnp.float32)  # exact/compact/frozen

    @jax.jit
    def exact_frame(P, T, frames, mode, i):
        out, _ = gut.render(*P, cam, pose_from_matrix(T), res, cap,
                            sh_degree=3, T_to_world=T, aux_gradients=False,
                            aux_outputs=False)
        return frames.at[mode, i].set(out.rgb)

    @jax.jit
    def refresh_frame(P, T, frames, mode, i):
        out, _, scene = infer.refresh(*P, cam, pose_from_matrix(T), res,
                                      cap, n_c, sh_degree=3, T_to_world=T,
                                      visibility_threshold=vis_t)
        return frames.at[mode, i].set(out.rgb), scene

    @jax.jit
    def compact_frame(scene, T, frames, mode, i):
        out, _ = infer.render_compact(scene, cam, pose_from_matrix(T), res,
                                      cap_c, sh_degree=3, T_to_world=T)
        return frames.at[mode, i].set(out.rgb)

    @jax.jit
    def capture(scene, T):
        return infer.capture_binning(scene, cam, pose_from_matrix(T), res,
                                     cap_c)

    @jax.jit
    def frozen_frame(scene, frozen, T, frames, mode, i):
        out = infer.render_frozen(scene, frozen, cam, pose_from_matrix(T),
                                  res, sh_degree=3,
                                  sorted_passes=sorted_frozen, T_to_world=T)
        return frames.at[mode, i].set(out.rgb)

    def fence(x):
        np.asarray(x[0, 0, 0, 0, 0])

    results = {}

    # exact
    for warm in (True, False):
        fr = frames
        t0 = time.perf_counter()
        for i, T in enumerate(Ts):
            fr = exact_frame(P, T, fr, 0, i)
        fence(fr)
        dt = (time.perf_counter() - t0) / F * 1000
        if warm:
            frames_exact = fr
        results["exact_ms"] = round(dt, 2)

    frames = frames_exact

    # compact
    for warm in (True, False):
        fr = frames
        t0 = time.perf_counter()
        scene = None
        for i, T in enumerate(Ts):
            if i % K == 0:
                fr, scene = refresh_frame(P, T, fr, 1, i)
            else:
                fr = compact_frame(scene, T, fr, 1, i)
        fence(fr)
        dt = (time.perf_counter() - t0) / F * 1000
        results["compact_ms"] = round(dt, 2)
        frames = fr

    # frozen
    for warm in (True, False):
        fr = frames
        t0 = time.perf_counter()
        scene = frozen = None
        for i, T in enumerate(Ts):
            if i % K == 0:
                fr, scene = refresh_frame(P, T, fr, 2, i)
                frozen = capture(scene, T)
            else:
                fr = frozen_frame(scene, frozen, T, fr, 2, i)
        fence(fr)
        dt = (time.perf_counter() - t0) / F * 1000
        results["frozen_ms"] = round(dt, 2)
        frames = fr

    # ---- parity ----------------------------------------------------------
    @jax.jit
    def psnr_stats(frames):
        ex = jnp.clip(frames[0], 0.0, 1.0)
        out = {}
        for mi, mode in ((1, "compact"), (2, "frozen")):
            ap = jnp.clip(frames[mi], 0.0, 1.0)
            mse = jnp.mean((ap - ex) ** 2, axis=(1, 2, 3))
            p = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
            out[mode] = (jnp.min(p), jnp.mean(p), jnp.max(p))
        return out

    stats = jax.tree.map(float, psnr_stats(frames))
    for mode in ("compact", "frozen"):
        mn, mean, mx = stats[mode]
        results[f"{mode}_psnr_min"] = round(mn, 2)
        results[f"{mode}_psnr_mean"] = round(mean, 2)

    results.update({
        "metric": "infer_orbit_1M" if on_tpu else "infer_orbit_cpu_smoke",
        "frames": F, "refresh_every": K, "deg_per_frame": deg,
        "n_compact": n_c, "cap_compact": cap_c,
        "visible": nvis,
        "exact_fps": round(1000.0 / results["exact_ms"], 1),
        "compact_fps": round(1000.0 / results["compact_ms"], 1),
        "frozen_fps": round(1000.0 / results["frozen_ms"], 1),
        "sorted_frozen": sorted_frozen,
        "vis_threshold": vis_t,
    })
    print(json.dumps(results))


if __name__ == "__main__":
    main()
