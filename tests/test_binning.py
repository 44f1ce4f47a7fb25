"""Direct tests of the Pallas binning-expansion and segment-sum kernels
against their XLA oracles (ops/pallas/expand.py, ops/pallas/segment_sum.py).

The render-level fast-vs-oracle tests cover these indirectly; these pin the
kernel contracts exactly (including sentinel slots, zero-count particles,
segments spanning many windows, and capacity overflow clipping)."""
import numpy as np
import jax
import jax.numpy as jnp

from threedgrut_tpu.ops import tiles as tile_ops
from threedgrut_tpu.ops.projection import Projection


def make_proj(n, seed, tile_range=5, dead_frac=0.4):
    rng = np.random.default_rng(seed)
    tmin = rng.integers(0, tile_range, (n, 2)).astype(np.int32)
    w = rng.integers(1, 3, (n,))
    h = rng.integers(1, 3, (n,))
    tmax = np.stack([tmin[:, 0] + w, tmin[:, 1] + h], -1).astype(np.int32)
    ntiles = (w * h).astype(np.int32)
    dead = rng.random(n) < dead_frac
    ntiles[dead] = 0
    return Projection(
        center=jnp.asarray(rng.uniform(0, 96, (n, 2)).astype(np.float32)),
        conic=jnp.asarray(
            np.abs(rng.normal(0.1, 0.05, (n, 3))).astype(np.float32)),
        comp_opacity=jnp.ones(n, jnp.float32),
        extent=jnp.ones((n, 2), jnp.float32),
        depth=jnp.asarray(rng.uniform(0.1, 10, n).astype(np.float32)),
        max_power=jnp.asarray(rng.uniform(0.5, 3.0, n).astype(np.float32)),
        valid=jnp.asarray(~dead),
        tile_min=jnp.asarray(tmin),
        tile_max=jnp.asarray(tmax),
        n_tiles=jnp.asarray(ntiles),
    )


def test_pallas_binning_matches_xla():
    grid = (6, 5)
    cap = 4096
    for n, seed, cull in ((700, 3, True), (700, 7, False), (513, 11, True),
                          (256, 13, True)):
        proj = make_proj(n, seed)
        b_new = tile_ops._bin_particles_pallas(proj, grid, cap, cull)
        b_old = tile_ops._bin_particles_xla(proj, grid, cap, cull)
        nv = int(np.sum(np.asarray(b_new.sorted_tile) < grid[0] * grid[1]))
        for f in ("sorted_tile", "tile_starts", "tile_ends",
                  "particle_ends", "particle_counts"):
            assert np.array_equal(np.asarray(getattr(b_new, f)),
                                  np.asarray(getattr(b_old, f))), (f, seed)
        # Sentinel-region slots (beyond the culled pairs) carry culled/tail
        # ids whose order may differ; only the valid region must agree.
        for f in ("sorted_particle_idx", "sorted_rowbits"):
            assert np.array_equal(np.asarray(getattr(b_new, f))[:nv],
                                  np.asarray(getattr(b_old, f))[:nv]), f


def test_pallas_binning_overflow_flag():
    proj = make_proj(2000, 5, dead_frac=0.0)
    b = tile_ops._bin_particles_pallas(proj, (6, 5), 1024, True)
    assert bool(b.overflow)
    assert int(b.num_intersections) > 1024


def test_segment_sum_rows():
    from threedgrut_tpu.ops.pallas.segment_sum import segment_sum_rows
    rng = np.random.default_rng(0)
    n, cap, F = 512, 4096, 16
    counts = rng.integers(0, 7, n)
    counts[5] = 0
    counts[100:110] = 0
    counts[200] = 600          # segment spanning multiple 256-slot windows
    ends = np.cumsum(counts).astype(np.int32)
    total = int(ends[-1])
    g = np.zeros((cap, F), np.float32)
    g[:total] = rng.normal(size=(total, F)).astype(np.float32)
    g[total:] = 100.0          # junk beyond the real pairs must be ignored
    out = np.asarray(segment_sum_rows(jnp.asarray(g.T.copy()),
                                      jnp.asarray(ends))).T   # [F, N] -> [N, F]
    oracle = np.zeros((n, F), np.float32)
    s = 0
    for p in range(n):
        oracle[p] = g[s:ends[p]].sum(0)
        s = ends[p]
    assert np.abs(out - oracle).max() < 1e-4

    # Overflow clipping: ends beyond cap are clamped, result stays finite.
    ends2 = ends.copy()
    ends2[-256:] = cap + 500
    out2 = np.asarray(segment_sum_rows(jnp.asarray(g.T.copy()),
                                       jnp.asarray(ends2)))
    assert np.isfinite(out2).all()


def test_cull_masks_pallas_matches_xla():
    """cull_masks_pallas (interpret mode here) must be bit-identical to the
    XLA form: same counts, same 24/24/16 mask words — including dead
    particles (n_tiles=0 with nonzero bbox), non-maskable bboxes (> 8x8),
    and culling-heavy conics. _CM_BLK | n required by the dispatch."""
    from threedgrut_tpu.ops.pallas import expand as ex

    n = ex._CM_BLK * 2
    rng = np.random.default_rng(17)
    tmin = rng.integers(0, 40, (n, 2)).astype(np.int32)
    w = rng.integers(1, 12, (n,))          # some > 8 -> non-maskable
    h = rng.integers(1, 12, (n,))
    tmax = np.stack([tmin[:, 0] + w, tmin[:, 1] + h], -1).astype(np.int32)
    ntiles = (w * h).astype(np.int32)
    ntiles[rng.random(n) < 0.3] = 0        # dead
    conic = np.abs(rng.normal(0.05, 0.03, (n, 3))).astype(np.float32)
    conic[:, 1] *= 0.2
    center = rng.uniform(0, 40 * 16.0, (n, 2)).astype(np.float32)
    max_power = rng.uniform(0.2, 4.0, n).astype(np.float32)

    args = (jnp.asarray(tmin), jnp.asarray(tmax), jnp.asarray(ntiles),
            jnp.asarray(conic), jnp.asarray(center), jnp.asarray(max_power))
    got = ex.cull_masks_pallas(*args)
    import os
    os.environ["THREEDGRUT_CULLMASK"] = "xla"
    try:
        want = ex.cull_masks(*args, True)
    finally:
        del os.environ["THREEDGRUT_CULLMASK"]
    for name, a, b in zip(("counts", "m0", "m1", "m2"), got, want):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    # The scene must exercise culling (otherwise vacuous).
    assert int(np.asarray(want[0]).sum()) < int(ntiles.sum())
