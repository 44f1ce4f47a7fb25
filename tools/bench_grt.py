"""Secondary benchmark: the 3DGRT trace path (arbitrary rays) on one chip.

Prints one JSON line like bench.py. The reference's 3DGRT is ~2.4x slower
than its 3DGUT (README.md: lego 360 vs 826 FPS) — expect a similar ratio.

Env knobs:
  BENCH_AUTOTUNE=1  probe true candidate counts, derive capacities
  BENCH_GRT_1M=1    1M-Gaussian datapoint (BASELINE's metric scale)
  BENCH_INFER=1     forward-only (inference/FPS column) instead of fwd+bwd
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from threedgrut_tpu.render import grt

    on_tpu = jax.default_backend() == "tpu"
    at_1m = bool(os.environ.get("BENCH_GRT_1M"))
    infer = bool(os.environ.get("BENCH_INFER"))
    if on_tpu and at_1m:
        # 1M Gaussians (BASELINE.md's metric scale). Autotuned like below:
        # the solid-ball scene means any cone covers ~20% of the scene, so
        # the super list is large; flat total measured by the probe.
        n, side, cand, iters = 1_000_000, 512, 7680, 10
        super_cap = 216832         # probe super max 196936 +10%
        flat_cap = 3384832         # probe flat total 3076992 +10%
        sflat_cap = 4591104        # probe super flat total 4173696 +10%
    elif on_tpu:
        # Capacities follow bench.py's autotune convention: derived once
        # from the true per-level candidate counts of this fixed seeded
        # scene (+headroom, 256-aligned) via BENCH_AUTOTUNE=1, then
        # hardcoded so the driver's timed run skips the probe compile.
        n, side, cand, iters = 100_000, 512, 1792, 10
        super_cap = 24320          # zero-truncation (probe max 22093 +10%)
        flat_cap = 919296          # flat total (probe 835584 +10%, 256-al.)
        sflat_cap = 1004800        # probe super flat total 913408 +10%
    else:
        n, side, cand, iters = 2_000, 64, 256, 2
        super_cap = 1024
        flat_cap = None
        sflat_cap = None
    n_rays = side * side

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0, 1.0, (n, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    scale_rng = (0.004, 0.02) if at_1m else (0.01, 0.05)
    s = jnp.asarray(np.exp(rng.uniform(np.log(scale_rng[0]),
                                       np.log(scale_rng[1]),
                                       (n, 3))).astype(np.float32))
    opa = jnp.full((n,), 0.5, jnp.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1, 1, (n, 3))
    feats = jnp.asarray(feats)

    # Camera-like ray grid with per-pixel jitter, traced in 16x16-pixel-tile
    # bundles (how render()/the playground bundle rays). Bundle coherence is
    # what the culling cone exploits — random per-ray directions would make
    # every cone cover the whole frustum, a workload neither renderer
    # (reference included: its BVH traversal equally depends on coherence)
    # ever sees.
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (n_rays, 1))
    px = (np.arange(side) + 0.5) / side * 0.8 - 0.4
    gx, gy = np.meshgrid(px, px, indexing="xy")
    jit = rng.uniform(-0.4 / side, 0.4 / side, (2,) + gx.shape)
    d_img = np.stack([gx + jit[0], gy + jit[1], np.ones_like(gx)],
                     -1).astype(np.float32)
    t = side // 16
    d_tiles = d_img.reshape(t, 16, t, 16, 3).transpose(0, 2, 1, 3, 4)
    d = d_tiles.reshape(n_rays, 3)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    if on_tpu and os.environ.get("BENCH_AUTOTUNE"):
        from threedgrut_tpu import constants as C

        @jax.jit
        def probe(pos, opa):
            radius = grt.bounding_radius(s, opa, C.KERNEL_DEGREE_3DGRT)
            valid = opa >= C.MIN_ALPHA
            bundles = grt.make_bundles(o, d, 256)
            perm = grt.bundle_morton_order(bundles)
            sup = grt.make_super_bundles(bundles, perm, 16)
            # Cap the probe's super width: [ns, 16, S] f32 temps at S = n
            # would be tens of GB at 1M Gaussians. 2^18 is comfortably above
            # any measured super count; the probe still reports c1 so an
            # overflowing cap is visible.
            s_probe = min(int(n), 1 << 18)
            hit1, _ = grt._cone_hit(pos, radius, valid, sup)
            counts1 = jnp.sum(hit1.astype(jnp.int32), axis=1)
            c1 = jnp.max(counts1)
            s_flat = jnp.sum(-(-counts1 // 128) * 128)
            ci, counts, ovf, _ = grt.bundle_candidates_twolevel(
                pos, radius, valid, o, d, 256, s_probe,
                super_capacity=s_probe)
            return c1, s_flat, counts
        c1, s_flat, counts = probe(pos, opa)
        counts = np.asarray(counts)
        up = lambda x, h, a=256: -(-int(int(x) * h) // a) * a
        super_cap, cand = up(c1, 1.10), up(counts.max(), 1.15)
        ch = 128
        flat_total = int(np.sum(-(-counts // ch) * ch))
        flat_cap = up(flat_total, 1.10)
        sflat_cap = up(int(s_flat), 1.10)
        print({"probe_super_max": int(c1),
               "probe_super_flat_total": int(s_flat),
               "probe_cand_max": int(counts.max()),
               "probe_cand_mean": round(float(counts.mean()), 1),
               "probe_flat_total": flat_total,
               "super_cap": super_cap, "cand": cand,
               "flat_cap": flat_cap, "sflat_cap": sflat_cap},
              flush=True)

    pk = os.environ.get("BENCH_PACKED", "")
    # BENCH_WALKFRAC: walked-compaction bound as a fraction of flat_cap
    # (0 = plain backward; see ops/fused_raster.composite_bundles). The
    # default matches the trainer's walk_compact_fraction; measured A/B at
    # 100k: 101.7 vs 106.0 ms.
    walk_frac = float(os.environ.get("BENCH_WALKFRAC", "0.625"))
    walk_cap = (-(-int(flat_cap * walk_frac) // 256) * 256
                if flat_cap and walk_frac > 0 else None)
    trace_kw = dict(candidate_capacity=cand, super_capacity=super_cap,
                    flat_capacity=flat_cap,
                    packed_cull=(pk == "1"), packed_l1=(pk == "l1"),
                    flat_cull=(pk == "flat"),
                    super_flat_capacity=(sflat_cap if pk == "flat"
                                         else None),
                    walk_capacity=walk_cap)

    if infer:
        def fwd(pos, opa, prev_rgb):
            # Frame chaining INSIDE jit — eager ops between frames cost a
            # ~25 ms tunnel round trip each (CLAUDE.md).
            opa = opa + 1e-20 * prev_rgb.reshape(-1)[0]
            out = grt.trace(pos, q, s, opa, feats, o, d, **trace_kw)
            return out.rgb, out.overflow
        step_i = jax.jit(fwd)
        rgb = jnp.zeros((n_rays, 3), jnp.float32)
        rgb, ovf = step_i(pos, opa, rgb)
        np.asarray(rgb[:1])
        overflow = bool(ovf)
        t0 = time.perf_counter()
        for _ in range(iters):
            rgb, ovf = step_i(pos, opa, rgb)
        np.asarray(rgb[:1])
        dt = time.perf_counter() - t0
        metric = "grt_trace_rays_per_s_infer"
    else:
        def fwd_bwd(pos, opa):
            def loss(pos, opa):
                out = grt.trace(pos, q, s, opa, feats, o, d, **trace_kw)
                return (jnp.mean(out.rgb) + jnp.mean(out.opacity),
                        out.overflow)
            (_, ovf), g = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(pos, opa)
            return pos + 1e-20 * g[0][0, 0], opa + 1e-20 * g[1][0], ovf

        step = jax.jit(fwd_bwd)
        p, a, ovf = step(pos, opa)
        np.asarray(p[:1])
        overflow = bool(ovf)
        t0 = time.perf_counter()
        for _ in range(iters):
            p, a, ovf = step(p, a)
        np.asarray(p[:1])
        dt = time.perf_counter() - t0
        metric = "grt_trace_rays_per_s_fwd_bwd"
    rays_per_s = n_rays * iters / dt
    print(json.dumps({
        "metric": metric,
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "backend": jax.default_backend(),
        "n_gaussians": n,
        "n_rays": n_rays,
        "candidate_capacity": cand,
        "flat_capacity": flat_cap,
        "packed_cull": pk or False,
        "candidate_overflow": overflow,
        "step_ms": round(1000.0 * dt / iters, 2),
    }))


if __name__ == "__main__":
    main()
