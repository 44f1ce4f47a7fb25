"""Per-stage timings of the 3DGUT train step on the real chip.

Chains ITERS executions of each jitted stage with ONE final tiny host
readback (the axon tunnel makes block_until_ready a no-op and each readback
costs ~25 ms — see CLAUDE.md), so per-iteration numbers are honest.

    python tools/bench_stages.py [stage ...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main(stages):
    import jax
    import jax.numpy as jnp
    from threedgrut_tpu.cameras import PinholeCamera, pose_from_matrix
    from threedgrut_tpu.datasets.dataset_synthetic import look_at
    from threedgrut_tpu.model import gaussians as G
    from threedgrut_tpu.render import gut
    from threedgrut_tpu.ops import tiles as tile_ops
    from threedgrut_tpu.ops import projection as proj_ops
    from threedgrut_tpu.ops.pallas import tile_raster
    from threedgrut_tpu import constants as C

    n, res, cap = 1_000_000, (800, 800), 3369728
    ITERS = int(os.environ.get("ITERS", "10"))
    rng = np.random.default_rng(0)
    params = G.from_arrays(
        rng.normal(0, 1.0, (n, 3)).astype(np.float32),
        rng.normal(size=(n, 4)).astype(np.float32),
        rng.uniform(np.log(0.004), np.log(0.02), (n, 3)).astype(np.float32),
        np.zeros((n, 1), np.float32),
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        np.zeros((n, 45), np.float32))
    w, h = res
    f = 0.9 * w
    cam = PinholeCamera(jnp.asarray([f, f]), jnp.asarray([w / 2, h / 2]),
                        jnp.zeros(6), jnp.zeros(2), jnp.zeros(4))
    T = jnp.asarray(look_at(np.array([0., -4., 1.], np.float32),
                            np.zeros(3, np.float32),
                            np.array([0., 0., 1.], np.float32)))

    def timed(name, fn, *args):
        """fn must map its first arg to a same-shaped output (chainable) or
        return anything whose first leaf we feed back via closure-free args."""
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1]) if leaf.ndim else np.asarray(leaf)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1]) if leaf.ndim else np.asarray(leaf)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:28s} {dt:8.2f} ms")
        return out

    pose = pose_from_matrix(T)
    wp, hp = gut.pad_to_tiles(res)
    tile_grid = (wp // C.TILE_X, hp // C.TILE_Y)

    want = (lambda s: not stages or s in stages)

    # --- projection + pack ---
    @jax.jit
    def do_proj(g):
        prj = proj_ops.project(g.get_positions(), g.get_rotation(),
                               g.get_scale(), g.get_density(), cam, pose,
                               0, res)
        return prj

    proj = do_proj(params)
    if want("proj"):
        timed("projection", do_proj, params)

    @jax.jit
    def do_bin(prj):
        return tile_ops.bin_particles(prj, tile_grid, cap)

    binning = do_bin(proj)
    if want("bin"):
        timed("bin_particles", do_bin, proj)
        num_tiles = tile_grid[0] * tile_grid[1]
        valid_pairs = int(np.sum(np.asarray(binning.sorted_tile) < num_tiles))
        total = int(binning.num_intersections)
        print(f"    pairs: total={total} survive_cull={valid_pairs} "
              f"({100.0 * valid_pairs / max(total, 1):.1f}%) cap={cap}")

    @jax.jit
    def do_pack(g):
        from threedgrut_tpu.render.gut_reference import (
            camera_center_world, precomputed_features)
        colors = precomputed_features(g.get_positions(), g.get_features(),
                                      camera_center_world(pose), 3)
        return gut.pack_particles(g.get_positions(), g.get_rotation(),
                                  g.get_scale(), g.get_density(), colors)

    packed = do_pack(params)
    if want("pack"):
        timed("pack+sh", do_pack, params)

    @jax.jit
    def do_gather(pk, b):
        return pk[b.sorted_particle_idx]

    data_sorted = do_gather(packed, binning)
    if want("gather"):
        timed("fwd gather packed[sorted]", do_gather, packed, binning)

    rays = jax.jit(lambda: gut.packed_world_rays(cam, pose, tile_grid, T))()
    jax.block_until_ready(rays)

    @jax.jit
    def do_fwd(ds, b, r):
        return tile_raster.tile_composite(ds, b.tile_starts, b.tile_ends, r,
                                          2, 1e-4, has_t_max=False)

    out_f = do_fwd(data_sorted, binning, rays)
    if want("fwd"):
        timed("pallas fwd", do_fwd, data_sorted, binning, rays)

    @jax.jit
    def do_fwd_bwd(ds, b, r):
        def f(ds_):
            # rgb+opacity cotangents only, matching the trainer
            # (aux_grads=False skips depth/transmittance chains).
            o = tile_raster.tile_composite(ds_, b.tile_starts, b.tile_ends,
                                           r, 2, 1e-4, has_t_max=False,
                                           aux_grads=False)
            return jnp.sum(o[:, 0:4, :])
        return jax.grad(f)(ds)

    g_ds = do_fwd_bwd(data_sorted, binning, rays)
    if want("bwd"):
        timed("pallas fwd+bwd", do_fwd_bwd, data_sorted, binning, rays)

    if want("strag"):
        # Straggler census: the window walk of a tile only early-exits when
        # ALL 256 pixels saturate. Pixels that never saturate (rays through
        # gaps) force their tile to walk its full slot range. The min_t
        # sweep bounds what per-pixel termination could save.
        for mt in (1e-3, 1e-2, 3e-2):
            @jax.jit
            def do_fwd_mt(ds, b, r, mt=mt):
                return tile_raster.tile_composite(
                    ds, b.tile_starts, b.tile_ends, r, 2, mt,
                    has_t_max=False)
            timed(f"pallas fwd min_t={mt:g}", do_fwd_mt, data_sorted,
                  binning, rays)
        t_end = np.asarray(out_f[:, 5, :])
        frac_pix = float((t_end > 1e-4).mean())
        frac_tile = float((t_end > 1e-4).any(axis=1).mean())
        print(f"    unsaturated pixels {frac_pix:.4f}, tiles w/ straggler "
              f"{frac_tile:.4f}")

    if want("contrib"):
        # Perfect-cull upper bound: fraction of slots whose particle
        # contributes w_ > 0 to ANY pixel of its tile (kernel emit_flags
        # bit). 1 - this is what an ORACLE cull could remove from capacity;
        # no computable test can reach it (the response evaluation IS the
        # kernel), but it bounds every culling idea's payoff.
        @jax.jit
        def do_flags(ds, b, r):
            return tile_raster._forward(
                ds, b.tile_starts, b.tile_ends, r, 2, 1e-4, 0.0113,
                1 / 255, 0.99, has_t_max=False, emit_flags=True)[1]
        flags = np.asarray(do_flags(data_sorted, binning, rays))
        ranges = (np.asarray(binning.tile_ends)
                  - np.asarray(binning.tile_starts)).astype(np.float64)
        tot = max(ranges.sum(), 1.0)
        print(f"    contributing slots {flags.sum() / tot:.4f} of range "
              f"(cap {flags.shape[0]})")

    if want("lanes"):
        # Lane-compaction sizing census (kernel census mode, row 7): how
        # many slots are walked while <= 128 (<= 64) pixels are alive — the
        # only regime where half(quarter)-width windows can cut VPU time.
        @jax.jit
        def do_census(ds, b, r):
            return tile_raster._forward(
                ds, b.tile_starts, b.tile_ends, r, 2, 1e-4, 0.0113,
                1 / 255, 0.99, has_t_max=False, census=True)
        outc = do_census(data_sorted, binning, rays)
        row7 = np.asarray(outc[:, 7, :4])
        walked, c128, c64, unsat = row7.T
        ranges = (np.asarray(binning.tile_ends)
                  - np.asarray(binning.tile_starts)).astype(np.float64)
        tot = max(ranges.sum(), 1.0)
        print(f"    slots: range {int(tot)} walked {walked.sum()/tot:.3f} "
              f"alive>128 {c128.sum()/tot:.3f} alive>64 {c64.sum()/tot:.3f}")
        half = (walked - c128).sum() / tot          # half-width eligible
        quarter = (walked - c64).sum() / tot
        print(f"    half-width-eligible walked slots {half:.3f}, "
              f"64-alive {quarter:.3f}; unsat mean {unsat.mean():.1f}/tile")

    if want("rowterm"):
        # Per-pixel last-touch termination probe (ops/tiles.row_last_touch
        # + tile_composite row_termination): kernel time with the bound vs
        # without, plus the forward image delta (the footprint gate drops
        # contributions outside the 2D projected row extent).
        lt = jax.jit(lambda b, p: tile_ops.row_last_touch(b, p, tile_grid))(
            binning, proj)
        rays_lt = rays.at[:, 7, :].set(lt)
        jax.block_until_ready(rays_lt)
        ltn = np.asarray(lt[:, ::16])
        ends = np.asarray(binning.tile_ends).astype(np.float64)
        starts = np.asarray(binning.tile_starts).astype(np.float64)
        span = np.maximum(ends - starts, 0.0)
        # Upper bound on walked-window reduction if saturation never fired:
        # walk to max over rows of lt instead of end.
        walk_lt = np.maximum(ltn.max(axis=1) + 1 - starts, 0.0)
        print(f"    walk bound: sum(end-start) {span.sum():.3g} -> "
              f"sum(lt-start) {walk_lt.sum():.3g} "
              f"({100 * walk_lt.sum() / max(span.sum(), 1):.1f}%)")

        @jax.jit
        def do_fwd_rt(ds, b, r):
            return tile_raster.tile_composite(
                ds, b.tile_starts, b.tile_ends, r, 2, 1e-4,
                has_t_max=False, row_termination=True)
        out_rt = timed("pallas fwd rowterm", do_fwd_rt, data_sorted,
                       binning, rays_lt)
        d = np.abs(np.asarray(out_rt[:, 0:4]) - np.asarray(out_f[:, 0:4]))
        print(f"    fwd rgb+op delta: max {d.max():.3g} mean {d.mean():.3g}")

        @jax.jit
        def do_fwd_bwd_rt(ds, b, r):
            def f(ds_):
                o = tile_raster.tile_composite(
                    ds_, b.tile_starts, b.tile_ends, r, 2, 1e-4,
                    has_t_max=False, aux_grads=False, lowprec_grads=True,
                    row_termination=True)
                return jnp.sum(o[:, 0:4, :])
            return jax.grad(f)(ds)
        timed("pallas fwd+bwd lp rowterm", do_fwd_bwd_rt, data_sorted,
              binning, rays_lt)

        @jax.jit
        def do_lt(b, p):
            return tile_ops.row_last_touch(b, p, tile_grid)
        timed("row_last_touch (XLA probe)", do_lt, binning, proj)

    if want("bwdlp"):
        @jax.jit
        def do_fwd_bwd_lp(ds, b, r):
            def f(ds_):
                o = tile_raster.tile_composite(
                    ds_, b.tile_starts, b.tile_ends, r, 2, 1e-4,
                    has_t_max=False, aux_grads=False, lowprec_grads=True)
                return jnp.sum(o[:, 0:4, :])
            return jax.grad(f)(ds)
        timed("pallas fwd+bwd lowprec", do_fwd_bwd_lp, data_sorted, binning,
              rays)

    # --- sorted_gather backward components ---
    # A synthetic permutation stands in for the former expansion-slot perm
    # (the backward now keys on sorted_particle_idx; the probes time the
    # same data movement).
    perm = jnp.asarray(
        np.random.default_rng(3).permutation(cap).astype(np.int32))
    if want("sg"):
        @jax.jit
        def do_argsort(p):
            return jnp.argsort(p)
        inv = timed("argsort(perm)", do_argsort, perm)

        @jax.jit
        def do_inv_gather(g, i):
            return g[i]
        g_exp = timed("gather g[inv] 16ch", do_inv_gather, g_ds, inv)

        @jax.jit
        def do_cumsum(x):
            return jnp.cumsum(x, axis=0)
        cum = timed("cumsum 16ch", do_cumsum, g_exp)

        @jax.jit
        def do_boundary(c, b):
            e = jnp.minimum(b.particle_ends, cap)
            s = jnp.minimum(b.particle_ends - b.particle_counts, cap)
            top = c[jnp.clip(e - 1, 0, cap - 1)]
            bot = jnp.where((s - 1 >= 0)[:, None],
                            c[jnp.clip(s - 1, 0, cap - 1)], 0.0)
            return jnp.where((e > s)[:, None], top - bot, 0.0)
        timed("boundary 2x gather N,16", do_boundary, cum, binning)

        @jax.jit
        def do_sg_bwd(g, b):
            from threedgrut_tpu.ops import sorted_gather as sg
            return sg._bwd("f32", (n, b.sorted_particle_idx, b.particle_ends,
                                   b.particle_counts), g)
        timed("sorted_gather bwd total", do_sg_bwd, g_ds, binning)

        @jax.jit
        def do_sg_bwd16(g, b):
            from threedgrut_tpu.ops import sorted_gather as sg
            return sg._bwd("bf16", (n, b.sorted_particle_idx,
                                    b.particle_ends, b.particle_counts), g)
        timed("sorted_gather bwd bf16", do_sg_bwd16, g_ds, binning)

    if want("bin2"):
        # bin_particles internals, with realistic data distributions
        counts = np.asarray(binning.particle_counts)
        ends = np.cumsum(counts)
        gx, gy = tile_grid

        @jax.jit
        def do_cummax(prj):
            cnt = prj.n_tiles.astype(jnp.int32)
            nn = cnt.shape[0]
            e = jnp.cumsum(cnt)
            st = e - cnt
            has = cnt > 0
            scatter_to = jnp.where(has, st, cap)
            marker = jnp.zeros((cap, 2), jnp.int32).at[scatter_to].max(
                jnp.stack([jnp.arange(nn, dtype=jnp.int32), st], axis=-1),
                mode="drop")
            return jax.lax.cummax(marker, axis=0)
        filled = timed("bin: scatter+cummax", do_cummax, proj)

        @jax.jit
        def do_attrs_gather(prj, f):
            attrs = jnp.concatenate([
                prj.tile_min.astype(jnp.float32),
                (prj.tile_max[:, 0] - prj.tile_min[:, 0])[:, None]
                .astype(jnp.float32),
                prj.n_tiles.astype(jnp.float32)[:, None],
                prj.depth[:, None],
                prj.conic,
                prj.center,
                prj.max_power[:, None],
            ], axis=-1)
            return attrs[f[:, 0]]
        timed("bin: attrs gather 11ch", do_attrs_gather, proj, filled)

        tk = np.asarray(binning.sorted_tile)
        rng2 = np.random.default_rng(1)
        tile_key_u = jnp.asarray(rng2.permutation(tk))
        depth_key_u = jnp.asarray(rng2.uniform(1, 8, cap).astype(np.float32))
        pidx_u = jnp.asarray(rng2.integers(0, n, cap, dtype=np.int32))
        slot_u = jnp.arange(cap, dtype=jnp.int32)

        @jax.jit
        def do_sort4(a, b, c, d):
            return jax.lax.sort((a, b, c, d), num_keys=2)
        timed("bin: lex sort 4 ops", do_sort4, tile_key_u, depth_key_u,
              pidx_u, slot_u)

        @jax.jit
        def do_sort3(a, b, d):
            return jax.lax.sort((a, b, d), num_keys=2)
        timed("bin: lex sort 3 ops", do_sort3, tile_key_u, depth_key_u,
              slot_u)

        @jax.jit
        def do_gather1(c, i):
            return c[i]
        timed("gather 1ch cap", do_gather1, pidx_u, slot_u)

    if want("aux"):
        # The residual outside render: loss fwd+bwd, Adam, ray generation.
        from threedgrut_tpu.model import losses as L
        from threedgrut_tpu import optimizers as O
        from threedgrut_tpu.config import Config as _Cfg
        gt = jnp.zeros((res[1], res[0], 3), jnp.float32)
        pred0 = jnp.full((res[1], res[0], 3), 0.3, jnp.float32)

        @jax.jit
        def do_loss(pred):
            def f(p):
                return L.total_loss(p, gt, 0.8, 0.0, 0.2)[0]
            return jax.grad(f)(pred)
        timed("loss L1+DSSIM fwd+bwd", do_loss, pred0)

        opt = O.init(params)
        _cfg = _Cfg()

        @jax.jit
        def do_adam(g, o):
            return O.step(g, g, o, _cfg.optimizer, jnp.float32(4.0),
                          visibility=g.alive)
        timed("adam step (grads=params)", do_adam, params, opt)

        @jax.jit
        def do_rays():
            return gut.packed_world_rays(cam, pose, tile_grid, T)
        timed("packed_world_rays", do_rays)

    if want("misc"):
        @jax.jit
        def do_scatter_set16(g, p):
            return jnp.zeros((cap, 16), jnp.float32).at[p].set(g)
        timed("scatter-set rows 16ch", do_scatter_set16, g_ds, perm)

        @jax.jit
        def do_scatter_set(p):
            return jnp.zeros((cap,), jnp.int32).at[p].set(
                jnp.arange(cap, dtype=jnp.int32), mode="drop")
        timed("scatter-set inv (unique)", do_scatter_set, perm)

        @jax.jit
        def do_sort3(prj):
            # 3-operand variant of the binning sort
            depth_key = jnp.zeros((cap,), jnp.float32)
            tile_key = jnp.zeros((cap,), jnp.int32)
            slot = jnp.arange(cap, dtype=jnp.int32)
            return jax.lax.sort((tile_key, depth_key, slot), num_keys=2)
        timed("sort 3 ops (zero keys)", do_sort3, proj)

    print("done")


if __name__ == "__main__":
    main(set(sys.argv[1:]))
