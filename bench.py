"""Headline benchmark: rays/s per chip, forward+backward, at 1M Gaussians.

Matches BASELINE.json's metric. The baseline denominator is the reference's
3DGUT unsorted lego training throughput on an RTX 5090: 30k iterations of
800x800 in 221.7 s (README.md:302) = 8.66e7 rays/s fwd+bwd (that figure
includes the reference's full train-step overheads; ours likewise times the
full jitted train step: render fwd + loss + backward + Adam).

Prints ONE JSON line. On non-TPU backends (driver smoke runs) the problem
size is scaled down; `vs_baseline` is only meaningful on TPU.
"""
from __future__ import annotations

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/jax_comp"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json
import time

import numpy as np

BASELINE_RAYS_PER_S = 8.66e7  # reference lego 3DGUT train, RTX 5090


def main():
    import jax
    import jax.numpy as jnp

    from threedgrut_tpu import optimizers
    from threedgrut_tpu.config import Config
    from threedgrut_tpu.datasets.dataset_synthetic import look_at
    from threedgrut_tpu.model import gaussians as G
    from threedgrut_tpu.trainer import _register_cfg, _step_impl
    from __graft_entry__ import _example_camera

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # 2917888 = ceil(1.08 * true intersection count for this fixed seeded
        # scene, 256-aligned; count-time culling makes the true count 2.70M)
        # — precomputed by the autotune probe below (set BENCH_AUTOTUNE=1 to
        # re-derive); hardcoding skips one large compile so the driver's
        # timed run is robust to compile-queue slowness. Every per-slot
        # stage (sorts, gathers, cumsums, kernel windows) scales with this
        # capacity; the adaptive trainer sizes the same way.
        n, res, iters, cap = 1_000_000, (800, 800), 10, 2917888
        import os as _os_cap
        cap = int(_os_cap.environ.get("BENCH_CAPACITY", cap))
    else:
        n, res, iters, cap = 2_000, (64, 64), 2, 1 << 13

    rng = np.random.default_rng(0)
    pos = rng.normal(0, 1.0, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.log(np.exp(rng.uniform(np.log(0.004), np.log(0.02),
                                       size=(n, 3)))).astype(np.float32)
    density = np.full((n, 1), 0.0, np.float32)     # sigmoid -> 0.5
    albedo = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    spec = np.zeros((n, 45), np.float32)
    params = G.from_arrays(pos, quats, scales, density, albedo, spec)
    opt = optimizers.init(params)

    cfg = Config()
    cfg.render.isect_capacity = cap
    cfg.model.background_color = "black"
    # BENCH_SORTED=16 measures the sorted ("k-buffer") preset's cost at the
    # same scene (config preset_sorted; ref configs/paper/3dgut/
    # base_sorted.yaml) — the RESULTS.md sorted-mode datapoint.
    sorted_passes = int(_os.environ.get("BENCH_SORTED", "0"))
    cfg.render.k_buffer_passes = sorted_passes
    # BENCH_ROWTERM=1/0 overrides per-pixel last-touch termination for A/B.
    if "BENCH_ROWTERM" in _os.environ:
        cfg.render.row_termination = bool(int(_os.environ["BENCH_ROWTERM"]))
    # BENCH_WALKFRAC overrides the walked-compaction bound for A/B (0 = the
    # plain two-stage backward).
    if "BENCH_WALKFRAC" in _os.environ:
        cfg.render.walk_compact_fraction = float(_os.environ["BENCH_WALKFRAC"])
    cfg_key = _register_cfg(cfg)

    cam = _example_camera(res)
    T = jnp.asarray(look_at(np.array([0., -4.0, 1.0], np.float32),
                            np.zeros(3, np.float32),
                            np.array([0., 0., 1.], np.float32)))
    gt = jnp.zeros((res[1], res[0], 3), jnp.float32)
    mask = jnp.ones((res[1], res[0], 1), jnp.float32)
    key = jax.random.PRNGKey(0)

    def make_step(capacity):
        def step(params, opt):
            return _step_impl(params, opt, T, cam, gt, mask, key,
                              jnp.float32(4.0), res, 3, cfg_key, train=True,
                              isect_capacity=capacity)
        return step

    # Capacity autotune BEFORE the first (donating) step: measure the true
    # intersection count, then build the step at ~15% headroom (what the
    # adaptive trainer converges to; the reference sizes its buffers from an
    # exact D2H count readback every frame).
    if on_tpu and _os.environ.get("BENCH_AUTOTUNE"):
        from threedgrut_tpu.render import gut as _gut
        from threedgrut_tpu.cameras import pose_from_matrix as _pfm
        _, binning, _, _ = jax.jit(
            lambda g: _gut.prepare(
                g.get_positions(), g.get_rotation(), g.get_scale(),
                g.get_density(), g.get_features(), cam, _pfm(T), res, cap))(
            params)
        total = int(binning.num_intersections)
        tuned = max(256, -(-int(total * 1.15) // 256) * 256)
        cap = min(cap, tuned)
    # BENCH_INFER=1: render-only throughput (the reference's eval FPS
    # column, README.md:250-306 — no loss/backward/Adam). Same scene and
    # capacity as the train-step metric so the two are comparable.
    if _os.environ.get("BENCH_INFER") == "compact":
        # Temporal hit-visibility compaction (render/infer.py): ONE refresh
        # (exact render + contributed-weight census + compaction at
        # threshold 1/255), then steady-state frames render only the
        # visible set at a proportionally smaller capacity. The reference
        # analogously amortizes BVH work across frames (tracer.py:190-208);
        # parity vs the exact frame is printed alongside (orbit-motion
        # parity is tools/bench_infer_orbit.py's job).
        from threedgrut_tpu.cameras import pose_from_matrix
        from threedgrut_tpu.render import gut, infer

        vis_t = float(_os.environ.get("BENCH_VIS_T", str(1.0 / 255.0)))
        n_c = min(int(_os.environ.get("BENCH_NC", "143360")), n)
        cap_c = min(int(_os.environ.get("BENCH_CAPC", "585472")), cap)

        @jax.jit
        def do_refresh(g, T_):
            out, ovf, scene = infer.refresh(
                g.get_positions(), g.get_rotation(), g.get_scale(),
                g.get_density(), g.get_features(), cam, pose_from_matrix(T_),
                res, cap, n_c, sh_degree=3, T_to_world=T_,
                visibility_threshold=vis_t)
            return out.rgb, ovf, scene

        @jax.jit
        def compact_frame(scene, T_, prev_rgb):
            scene = scene._replace(
                opacities=scene.opacities + 0.0 * prev_rgb.reshape(-1)[0])
            out, ovf = infer.render_compact(scene, cam, pose_from_matrix(T_),
                                            res, cap_c, sh_degree=3,
                                            T_to_world=T_)
            return out.rgb, ovf

        rgb_exact, ovf, scene = do_refresh(params, T)
        np.asarray(rgb_exact[:1, :1])
        assert not bool(scene.overflow), int(scene.count)
        rgb, covf = compact_frame(scene, T, rgb_exact)
        np.asarray(rgb[:1, :1])
        t0 = time.perf_counter()
        for _ in range(iters):
            rgb, covf = compact_frame(scene, T, rgb)
        np.asarray(rgb[:1, :1])
        dt = time.perf_counter() - t0
        mse = float(jnp.mean((jnp.clip(rgb, 0, 1)
                              - jnp.clip(rgb_exact, 0, 1)) ** 2))
        print(json.dumps({
            "metric": "rays_per_s_infer_compact_1M" if on_tpu
                      else "rays_per_s_infer_compact_cpu_smoke",
            "value": round(res[0] * res[1] * iters / dt, 1),
            "unit": "rays/s/chip",
            "fps": round(iters / dt, 2),
            "frame_ms": round(1000.0 * dt / iters, 2),
            "psnr_vs_exact": round(-10.0 * np.log10(max(mse, 1e-12)), 2),
            "visible": int(scene.count), "n_compact": n_c,
            "cap_compact": cap_c, "vis_threshold": vis_t,
            "isect_overflow": bool(ovf) or bool(covf),
            "backend": jax.default_backend(), "n_gaussians": n,
            "resolution": list(res), "iters": iters,
        }))
        return

    if _os.environ.get("BENCH_INFER"):
        from threedgrut_tpu.cameras import pose_from_matrix
        from threedgrut_tpu.render import gut

        @jax.jit
        def render_only(g, T_, prev_rgb):
            # Frame chaining lives INSIDE the jit: any eager op between
            # frames costs a ~25 ms tunnel round trip (CLAUDE.md).
            g = g.replace(density=g.density
                          + 0.0 * prev_rgb.reshape(-1)[0])
            pose = pose_from_matrix(T_)
            out, ovf = gut.render(
                g.get_positions(), g.get_rotation(), g.get_scale(),
                g.get_density(), g.get_features(), cam, pose, res, cap,
                sorted_passes=sorted_passes, T_to_world=T_)
            return out.rgb, ovf

        rgb = jnp.zeros((res[1], res[0], 3), jnp.float32)
        rgb, ovf = render_only(params, T, rgb)
        np.asarray(rgb[:1, :1])
        overflow = bool(ovf)
        t0 = time.perf_counter()
        for _ in range(iters):
            rgb, ovf = render_only(params, T, rgb)
        np.asarray(rgb[:1, :1])
        dt = time.perf_counter() - t0
        rays_per_s = res[0] * res[1] * iters / dt
        print(json.dumps({
            "metric": "rays_per_s_infer_1M_gaussians" if on_tpu
                      else "rays_per_s_infer_cpu_smoke",
            "value": round(rays_per_s, 1),
            "unit": "rays/s/chip",
            "fps": round(iters / dt, 2),
            "backend": jax.default_backend(),
            "n_gaussians": n,
            "resolution": list(res),
            "iters": iters,
            "isect_capacity": cap,
            "isect_overflow": overflow,
            "sorted_passes": sorted_passes,
            "frame_ms": round(1000.0 * dt / iters, 2),
        }))
        return

    step = make_step(cap)
    # The train step donates its inputs; always chain through the returns.
    p, o, aux = step(params, opt)
    # block_until_ready does NOT wait under the axon tunnel (CLAUDE.md):
    # force a tiny host readback to fence, once outside the timed loop.
    np.asarray(p.positions[:1])
    overflow = bool(aux["overflow"])

    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, aux = step(p, o)
    np.asarray(p.positions[:1])
    dt = time.perf_counter() - t0

    rays_per_s = res[0] * res[1] * iters / dt
    print(json.dumps({
        "metric": "rays_per_s_fwd_bwd_1M_gaussians" if on_tpu
                  else "rays_per_s_fwd_bwd_cpu_smoke",
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
        "backend": jax.default_backend(),
        "n_gaussians": n,
        "resolution": list(res),
        "iters": iters,
        "isect_capacity": cap,
        "isect_overflow": overflow,
        "sorted_passes": sorted_passes,
        "step_ms": round(1000.0 * dt / iters, 2),
    }))


if __name__ == "__main__":
    main()
