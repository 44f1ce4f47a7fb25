"""Row-termination (per-pixel last-touch) mode of the tile compositor.

The kernel's `row_termination` gates each pixel's compositing at the last
sorted slot whose PROJECTED footprint reaches the pixel's tile row (rays
row 7, ops/tiles.row_last_touch) and stops the window walk once every pixel
is saturated or past its bound — footprint-gated compositing, the same
approximation family as the reference's per-tile cull
(gutProjector.cuh:49-116), one granularity finer.
"""
import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu import constants as C
from threedgrut_tpu.cameras import pose_from_matrix
from threedgrut_tpu.datasets.dataset_synthetic import look_at
from threedgrut_tpu.model import gaussians as G
from threedgrut_tpu.ops import projection as proj_ops
from threedgrut_tpu.ops import tiles as tile_ops
from threedgrut_tpu.ops.pallas import tile_raster
from threedgrut_tpu.render import gut
from threedgrut_tpu.render.gut_reference import (camera_center_world,
                                                 precomputed_features)
from tests.test_cameras import make_pinhole

RES = (64, 64)


def _setup(n=400, seed=0, cap=4096):
    rng = np.random.default_rng(seed)
    params = G.from_arrays(
        rng.normal(0, 0.6, (n, 3)).astype(np.float32),
        rng.normal(size=(n, 4)).astype(np.float32),
        rng.uniform(np.log(0.01), np.log(0.05), (n, 3)).astype(np.float32),
        np.zeros((n, 1), np.float32),
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        np.zeros((n, 45), np.float32))
    w, h = RES
    cam = make_pinhole(f=0.9 * w, cx=w / 2, cy=h / 2)
    T = jnp.asarray(look_at(np.array([0., -4., 1.], np.float32),
                            np.zeros(3, np.float32),
                            np.array([0., 0., 1.], np.float32)))
    pose = pose_from_matrix(T)
    wp, hp = gut.pad_to_tiles(RES)
    tg = (wp // C.TILE_X, hp // C.TILE_Y)
    proj = proj_ops.project(params.get_positions(), params.get_rotation(),
                            params.get_scale(), params.get_density(),
                            cam, pose, 0, RES)
    binning = tile_ops.bin_particles(proj, tg, cap)
    colors = precomputed_features(params.get_positions(),
                                  params.get_features(),
                                  camera_center_world(pose), 3)
    packed = gut.pack_particles(params.get_positions(), params.get_rotation(),
                                params.get_scale(), params.get_density(),
                                colors)
    ds = packed[binning.sorted_particle_idx]
    rays = gut.packed_world_rays(cam, pose, tg, T)
    return params, proj, binning, ds, rays, tg, cap


def test_row_last_touch_matches_naive():
    """Blockwise segmented max == naive per-slot loop, except the documented
    conservative fallback (tiny segments strictly inside a foreign-owned
    block get their exact end) — never an underestimate."""
    _, proj, binning, _, _, tg, cap = _setup()
    num_tiles = tg[0] * tg[1]
    lt = np.asarray(tile_ops.row_last_touch(binning, proj, tg))[:, ::16]

    # The gather fallback (no rowbits) must agree with the sort-payload
    # fast path exactly.
    lt_slow = np.asarray(tile_ops.row_last_touch(
        binning._replace(sorted_rowbits=None), proj, tg))[:, ::16]
    assert np.array_equal(lt, lt_slow)

    st = np.asarray(binning.sorted_tile)
    pid = np.asarray(binning.sorted_particle_idx)
    py0, py1 = map(np.asarray, tile_ops.particle_row_extent(proj))
    naive = np.full((num_tiles, 16), -1.0, np.float32)
    for slot in range(cap):
        t = st[slot]
        if t >= num_tiles:
            continue
        ty = t // tg[0]
        # Clipped-interval cover contract (ops/tiles.row_last_touch).
        a = min(max(py0[pid[slot]] - ty * 16, 0.0), 15.0)
        b = min(max(py1[pid[slot]] - ty * 16, 0.0), 15.0)
        for r in range(16):
            if a <= r <= b:
                naive[t, r] = slot

    assert np.all(lt >= naive)          # conservative only
    s = np.asarray(binning.tile_starts)
    e = np.asarray(binning.tile_ends)
    first_t = st[(s // 256) * 256]
    last_t = st[np.minimum((s // 256) * 256 + 255, cap - 1)]
    tid = np.arange(num_tiles)
    fallback = ((e > s) & (s // 256 == (e - 1) // 256)
                & (first_t != tid) & (last_t != tid))
    exact = lt[~fallback] == naive[~fallback]
    assert exact.all(), f"{(~exact).sum()} non-fallback mismatches"


def test_row_termination_forward_backward_match():
    """On a generic scene the footprint gate drops nothing (the 1-px-padded
    2D proxy covers the 3D acceptance here): fwd AND bwd bit-match the
    unterminated kernel."""
    _, proj, binning, ds, rays, tg, _ = _setup()
    lt = tile_ops.row_last_touch(binning, proj, tg)
    rays_lt = rays.at[:, 7, :].set(lt)

    out0 = tile_raster.tile_composite(
        ds, binning.tile_starts, binning.tile_ends, rays, 2, 1e-4,
        has_t_max=False)
    out1 = tile_raster.tile_composite(
        ds, binning.tile_starts, binning.tile_ends, rays_lt, 2, 1e-4,
        has_t_max=False, row_termination=True)
    np.testing.assert_array_equal(np.asarray(out0[:, 0:7]),
                                  np.asarray(out1[:, 0:7]))

    probe = jnp.cos(0.01 * jnp.arange(out0.size).reshape(out0.shape))

    def loss(ds_, rt, ry):
        o = tile_raster.tile_composite(
            ds_, binning.tile_starts, binning.tile_ends, ry, 2, 1e-4,
            has_t_max=False, aux_grads=False, row_termination=rt)
        return jnp.sum(o[:, 0:4, :] * probe[:, 0:4, :])

    g0 = jax.grad(loss)(ds, False, rays)
    g1 = jax.grad(loss)(ds, True, rays_lt)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_row_termination_truncation_is_per_pixel():
    """A hand-shrunk bound composites exactly the slots <= bound per pixel:
    compare against the unterminated kernel run on data whose tail slots
    are disabled — per-pixel semantics, independent of other rows' walks."""
    _, proj, binning, ds, rays, tg, cap = _setup()
    num_tiles = tg[0] * tg[1]
    # Bound every pixel of every tile at the tile's midpoint slot.
    s, e = binning.tile_starts, binning.tile_ends
    mid = jnp.where(e > s, (s + e) // 2, -1).astype(jnp.float32)
    lt = jnp.broadcast_to(mid[:, None], (num_tiles, 256))
    rays_lt = rays.at[:, 7, :].set(lt)
    out1 = tile_raster.tile_composite(
        ds, binning.tile_starts, binning.tile_ends, rays_lt, 2, 1e-4,
        has_t_max=False, row_termination=True)

    # Reference: zero the opacity (packed col 12) of slots past each tile's
    # midpoint and run the plain kernel.
    slot = jnp.arange(cap)
    tile = binning.sorted_tile
    keep = slot <= jnp.where(tile < num_tiles, mid[jnp.minimum(
        tile, num_tiles - 1)].astype(jnp.int32), -1)
    ds_cut = ds.at[:, 12].set(jnp.where(keep, ds[:, 12], 0.0))
    out0 = tile_raster.tile_composite(
        ds_cut, binning.tile_starts, binning.tile_ends, rays, 2, 1e-4,
        has_t_max=False)
    np.testing.assert_allclose(np.asarray(out1[:, 0:4]),
                               np.asarray(out0[:, 0:4]), atol=1e-6)
