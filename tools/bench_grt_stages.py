"""Per-stage timings of the 3DGRT trace step (bench_grt.py workload).

    python tools/bench_grt_stages.py [stage ...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def main(stages):
    import jax
    import jax.numpy as jnp
    from threedgrut_tpu.render import grt
    from threedgrut_tpu.ops.pallas import bundle_trace
    from threedgrut_tpu.ops.sorted_gather import gather_rows
    from threedgrut_tpu import constants as C

    n = int(os.environ.get("GRT_N", "100000"))
    cand = int(os.environ.get("GRT_CAND", "2048"))
    s_cap_env = int(os.environ.get("GRT_SUPER", "11264"))
    side, ITERS = 512, int(os.environ.get("GRT_ITERS", "10"))
    n_rays = side * side
    nb = n_rays // 256

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0, 1.0, (n, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    scale_rng = (0.004, 0.02) if n >= 500_000 else (0.01, 0.05)
    s = jnp.asarray(np.exp(rng.uniform(np.log(scale_rng[0]),
                                       np.log(scale_rng[1]),
                                       (n, 3))).astype(np.float32))
    opa = jnp.full((n,), 0.5, jnp.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1, 1, (n, 3))
    feats = jnp.asarray(feats)

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

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1])
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:32s} {dt:8.2f} ms", flush=True)
        return out

    want = (lambda x: not stages or x in stages)

    radius = grt.bounding_radius(s, opa, C.KERNEL_DEGREE_3DGRT)
    bundles = jax.jit(lambda oo, dd: grt.make_bundles(oo, dd, 256))(o, d)

    @jax.jit
    def do_cull(p, r, b):
        return grt.bundle_candidates(p, r, opa >= C.MIN_ALPHA, b, cand)

    @jax.jit
    def do_cull2(p, r):
        return grt.bundle_candidates_twolevel(
            p, r, opa >= C.MIN_ALPHA, o, d, 256, cand,
            super_capacity=s_cap_env)

    cand_idx, cand_counts, ovf, vis = do_cull2(pos, radius)
    if want("cull"):
        timed("cone cull single-level (old)", do_cull, pos, radius, bundles)
        timed("cone cull two-level", do_cull2, pos, radius)
        counts = np.asarray(cand_counts)
        print(f"    candidates/bundle: mean {counts.mean():.0f} "
              f"max {counts.max()} cap {cand} overflow={bool(ovf)}")

    if want("cull2"):
        # Two-level internals at the zero-truncation super capacity.
        S_CAP = int(os.environ.get("GRT_SCAP2", "24320"))
        valid = opa >= C.MIN_ALPHA
        bundles_m = jax.jit(lambda oo, dd: grt.make_bundles(oo, dd, 256))(
            o, d)
        perm = jax.jit(grt.bundle_morton_order)(bundles_m)
        sup = jax.jit(lambda b, p: grt.make_super_bundles(b, p, 16))(
            bundles_m, perm)

        @jax.jit
        def l1_test(p, r):
            hit1, t1 = grt._cone_hit(p, r, valid, sup)
            return hit1, t1
        hit1, t1 = timed("  L1 cone test [64,100k]", l1_test, pos, radius)

        @jax.jit
        def l1_topk(h, t):
            key1 = jnp.where(h, -t, -jnp.inf)
            return jax.lax.top_k(key1, S_CAP)[1].astype(jnp.int32)
        sup_idx = timed("  L1 top_k -> super lists", l1_topk, hit1, t1)

        @jax.jit
        def l2_all(p, r, si):
            ns, s_cap2 = si.shape
            p_s = p[si.reshape(-1)].reshape(ns, s_cap2, 3)
            r_s = r[si.reshape(-1)].reshape(ns, s_cap2)
            ob = bundles_m.origin[perm].reshape(ns, 16, 3)
            db = bundles_m.direction[perm].reshape(ns, 16, 3)
            v = p_s[:, None, :, :] - ob[:, :, None, :]
            t_ax = jnp.einsum("nmsi,nmi->nms", v, db)
            d_ax = jnp.sqrt(jnp.maximum(
                jnp.sum(v * v, axis=-1) - t_ax * t_ax, 0.0))
            hit2 = d_ax <= (r_s[:, None, :] + 0.05)
            return hit2, t_ax
        hit2, t_ax2 = timed("  L2 cone test [64,16,S]", l2_all, pos, radius,
                            sup_idx)

        @jax.jit
        def l2_sort(h2, t2, si):
            key2 = jnp.where(h2, t2, jnp.inf)
            gid = jnp.broadcast_to(si[:, None, :], key2.shape)
            _, gs = jax.lax.sort((key2, gid), num_keys=1, dimension=-1)
            return gs[..., :cand]
        timed("  L2 depth sort+slice", l2_sort, hit2, t_ax2, sup_idx)

    if want("flatcull"):
        # Flat-cull decomposition (r5): total, the L1+flatten+L2-test
        # prefix, and the (m, capS) member-column sort vs the r5 pair-
        # expansion sort (the difference total - prefix isolates each).
        S_CAPF = int(os.environ.get("GRT_SCAPF", str(s_cap_env)))
        SFLAT = os.environ.get("GRT_SFLAT")
        SFLAT = int(SFLAT) if SFLAT else None
        FLATC = int(os.environ.get("GRT_FLATC", str(nb * cand)))
        valid_m = opa >= C.MIN_ALPHA

        def fc(expand):
            @jax.jit
            def run(p, r):
                return grt.bundle_candidates_twolevel_flat(
                    p, r, valid_m, o, d, 256, cand,
                    super_capacity=S_CAPF, super_flat_capacity=SFLAT,
                    flat_capacity=FLATC, expand_sort=expand)
            return run

        out_e = timed("flat cull total (expand_sort)", fc(True), pos,
                      radius)
        print(f"    overflow={bool(out_e[4])}")
        timed("flat cull total (column sort)", fc(False), pos, radius)

    @jax.jit
    def do_pack(p):
        return grt.pack_rows64(p, q, s, opa, feats)

    rows64 = do_pack(pos)
    if want("pack"):
        timed("pack_rows64", do_pack, pos)

    FLAT_CAP = int(os.environ.get("GRT_FLAT_CAP", str(nb * cand)))

    @jax.jit
    def do_flatten(ci, cn):
        return grt.flatten_candidates(ci, cn, FLAT_CAP)

    flat_idx, valid, ws, we, ovf_f, _wb = do_flatten(cand_idx, cand_counts)
    if want("flatten"):
        timed("flatten_candidates", do_flatten, cand_idx, cand_counts)
        counts = np.asarray(cand_counts)
        tot = int(np.sum(-(-counts // 128) * 128))
        print(f"    flat total {tot} capF {FLAT_CAP} "
              f"overflow={bool(ovf_f)}")

    @jax.jit
    def do_gather(r64, fi, va):
        data = gather_rows(r64, fi)
        return data.at[:, 12].multiply(va.astype(data.dtype))

    data = do_gather(rows64, flat_idx, valid)
    if want("gather"):
        timed("gather_rows fwd", do_gather, rows64, flat_idx, valid)

        @jax.jit
        def do_gather_bwd(r64, fi, va):
            def f(rr):
                dd = gather_rows(rr, fi)
                dd = dd.at[:, 12].multiply(va.astype(dd.dtype))
                return jnp.sum(dd * dd)
            return jax.grad(f)(r64)
        timed("gather_rows fwd+bwd", do_gather_bwd, rows64, flat_idx,
              valid)

    rays_img = jnp.concatenate([
        o, d, jnp.zeros((n_rays, 1)), jnp.ones((n_rays, 1))], axis=-1)
    rays = rays_img.reshape(nb, 256, 8).transpose(0, 2, 1)

    @jax.jit
    def do_fwd(dd, r, ws_, we_):
        return bundle_trace.bundle_composite(
            dd, r, ws_, we_, C.KERNEL_DEGREE_3DGRT, 3,
            C.MIN_TRANSMITTANCE_3DGRT)

    out = do_fwd(data, rays, ws, we)
    if want("fwd"):
        timed("bundle fwd", do_fwd, data, rays, ws, we)

    if want("bwd"):
        @jax.jit
        def do_fwd_bwd(dd, r, ws_, we_):
            def f(dd_):
                o_ = bundle_trace.bundle_composite(
                    dd_, r, ws_, we_, C.KERNEL_DEGREE_3DGRT, 3,
                    C.MIN_TRANSMITTANCE_3DGRT)
                return jnp.sum(o_[:, 0:4, :])
            return jax.grad(f)(dd)
        timed("bundle fwd+bwd", do_fwd_bwd, data, rays, ws, we)

        @jax.jit
        def do_fwd_bwd_sorted(dd, r, ws_, we_):
            def f(dd_):
                o_ = bundle_trace.bundle_composite(
                    dd_, r, ws_, we_, C.KERNEL_DEGREE_3DGRT, 3,
                    C.MIN_TRANSMITTANCE_3DGRT,
                    sorted_passes=C.GRT_SORTED_PASSES)
                return jnp.sum(o_[:, 0:4, :])
            return jax.grad(f)(dd)
        timed("bundle fwd+bwd sorted16", do_fwd_bwd_sorted, data, rays,
              ws, we)

    print("done")


if __name__ == "__main__":
    main(set(sys.argv[1:]))
