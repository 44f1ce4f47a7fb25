"""Census: conservative coarse occlusion pre-pass — build or refute (r5).

The contributed-slot oracle (tools/bench_stages.py contrib) says only 33.4%
of slots contribute and 53.6% of the waste is occlusion-beyond-saturation.
This probe measures what a COMPUTABLE conservative bound can recover of
that: per (tile, pixel-block) upper-bound transmittance from full-block-
cover lower-bound alphas.

  alpha_lb(slot, block) = comp_opacity * exp(-max_corner_power)
    (power is convex quadratic in pixel coords -> max over a rect is at a
     corner, so alpha_lb lower-bounds alpha at EVERY pixel of the block)
  T_ub(slot, block) = prod over earlier slots of (1 - alpha_lb)
    (subset product of >= factors -> upper-bounds every pixel's true
     transmittance in the block)
  cull(slot) iff every block its footprint (center +- extent) touches has
    T_ub < min_transmittance — EXACT: the kernel itself drops hits once the
    pixel's transmittance is below min_T, so culled pairs never contribute.

Reports, per block granularity (16 = whole tile, 8, 4 px):
  * pair-cull fraction (what a COUNT-TIME cull could remove from capacity)
  * window-suffix fraction (culled windows are per-tile suffixes ->
    compactable at CHUNK granularity for the forward gather / backward)
against the kernel's own walked census (the exact upper bound).

Run on TPU: python tools/probe_occlusion.py
"""
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
    from threedgrut_tpu.cameras import PinholeCamera, pose_from_matrix
    from threedgrut_tpu.datasets.dataset_synthetic import look_at
    from threedgrut_tpu.model import gaussians as G
    from threedgrut_tpu.render import gut
    from threedgrut_tpu.ops import tiles as tile_ops
    from threedgrut_tpu.ops import projection as proj_ops
    from threedgrut_tpu.ops.pallas import tile_raster
    from threedgrut_tpu import constants as C

    n = int(os.environ.get("PROBE_N", "1000000"))
    res, cap = (800, 800), int(os.environ.get("PROBE_CAP", "2917888"))
    min_t = 1e-4
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
    pose = pose_from_matrix(T)
    wp, hp = gut.pad_to_tiles(res)
    tile_grid = (wp // C.TILE_X, hp // C.TILE_Y)
    gx = tile_grid[0]
    num_tiles = gx * tile_grid[1]

    @jax.jit
    def build(g):
        prj = proj_ops.project(g.get_positions(), g.get_rotation(),
                               g.get_scale(), g.get_density(), cam, pose,
                               0, res)
        b = tile_ops.bin_particles(prj, tile_grid, cap)
        return prj, b

    proj, binning = build(params)
    jax.block_until_ready(binning.sorted_tile)

    ch = tile_raster.CHUNK

    def census(block_px: int):
        nbx = C.TILE_X // block_px
        nb = nbx * (C.TILE_Y // block_px)

        @jax.jit
        def run(prj, b):
            pid = jnp.minimum(b.sorted_particle_idx, n - 1)
            real = b.sorted_tile < num_tiles
            tile = jnp.minimum(b.sorted_tile, num_tiles - 1)
            # Per-slot particle attrs (offline probe: one [cap, 9] gather).
            attr = jnp.concatenate([
                prj.conic, prj.center, prj.comp_opacity[:, None],
                prj.extent, prj.max_power[:, None]], axis=-1)[pid]
            cx, cb, cz = attr[:, 0], attr[:, 1], attr[:, 2]
            mx, my = attr[:, 3], attr[:, 4]
            opa = jnp.where(real, attr[:, 5], 0.0)
            ex, ey = attr[:, 6], attr[:, 7]

            tx = (tile % gx).astype(jnp.float32) * C.TILE_X
            ty = (tile // gx).astype(jnp.float32) * C.TILE_Y
            bi = jnp.arange(nb, dtype=jnp.float32)
            bx0 = tx[:, None] + (bi % nbx) * block_px          # [cap, nb]
            by0 = ty[:, None] + (bi // nbx) * block_px

            def power(px, py):
                dx = px - mx[:, None]
                dy = py - my[:, None]
                return (0.5 * (cx[:, None] * dx * dx
                               + cz[:, None] * dy * dy)
                        + cb[:, None] * dx * dy)

            pmax = jnp.maximum(
                jnp.maximum(power(bx0, by0), power(bx0 + block_px, by0)),
                jnp.maximum(power(bx0, by0 + block_px),
                            power(bx0 + block_px, by0 + block_px)))
            alpha_lb = jnp.minimum(opa[:, None] * jnp.exp(-pmax),
                                   C.MAX_ALPHA)
            # Alphas below the acceptance threshold never composite.
            alpha_lb = jnp.where(alpha_lb >= C.MIN_ALPHA, alpha_lb, 0.0)
            logs = jnp.log1p(-alpha_lb)                        # [cap, nb]

            # Exclusive per-tile prefix sum: global cumsum minus the
            # tile-start offset (slots are contiguous per tile).
            cum = jnp.cumsum(logs, axis=0)
            excl = cum - logs
            start_of = b.tile_starts[tile]                     # [cap]
            base = jnp.where((start_of > 0)[:, None],
                             cum[jnp.maximum(start_of - 1, 0)],
                             0.0)
            t_ub_log = excl - base                             # [cap, nb]
            saturated = t_ub_log < jnp.log(jnp.float32(min_t))

            # Footprint touch: block rect vs center +- extent.
            touch = ((bx0 < mx[:, None] + ex[:, None])
                     & (bx0 + block_px > mx[:, None] - ex[:, None])
                     & (by0 < my[:, None] + ey[:, None])
                     & (by0 + block_px > my[:, None] - ey[:, None]))
            cullable = jnp.all(saturated | ~touch, axis=1) & real

            n_real = jnp.sum(real.astype(jnp.int32))
            n_cull = jnp.sum(cullable.astype(jnp.int32))

            # Window-suffix exploitation: per tile, first slot NOT cullable
            # from the end -> new_end; culled windows = suffix windows.
            # new_end[t] = 1 + max slot index in tile t with ~cullable.
            slot = jnp.arange(cap, dtype=jnp.int32)
            keyslot = jnp.where(real & ~cullable, slot, -1)
            new_end = jax.ops.segment_max(keyslot, tile,
                                          num_segments=num_tiles) + 1
            new_end = jnp.maximum(new_end, b.tile_starts)
            old_w = (-(-(b.tile_ends - b.tile_starts)) // 1)
            spans_old = jnp.sum(jnp.maximum(
                b.tile_ends - b.tile_starts, 0))
            spans_new = jnp.sum(jnp.maximum(new_end - b.tile_starts, 0))
            # CHUNK-granular window counts (what compaction actually saves).
            w_old = jnp.sum(jnp.maximum(
                (b.tile_ends - 1) // ch - b.tile_starts // ch + 1,
                0) * (b.tile_ends > b.tile_starts))
            w_new = jnp.sum(jnp.maximum(
                (jnp.maximum(new_end, b.tile_starts + 1) - 1) // ch
                - b.tile_starts // ch + 1, 0)
                * (new_end > b.tile_starts))
            del old_w
            return (n_real, n_cull, spans_old, spans_new, w_old, w_new)

        t0 = time.perf_counter()
        vals = [int(x) for x in jax.tree.leaves(run(proj, binning))]
        dt = time.perf_counter() - t0
        n_real, n_cull, s_old, s_new, w_old, w_new = vals
        print(f"block {block_px:2d}px: cullable pairs {n_cull}/{n_real} "
              f"({100*n_cull/max(n_real,1):.1f}%)  "
              f"slot-span {s_old} -> {s_new} "
              f"({100*s_new/max(s_old,1):.1f}%)  "
              f"windows {w_old} -> {w_new} "
              f"({100*w_new/max(w_old,1):.1f}%)  [{dt:.1f}s incl compile]",
              flush=True)

    for g in (16, 8, 4, 2):
        census(g)


if __name__ == "__main__":
    main()
