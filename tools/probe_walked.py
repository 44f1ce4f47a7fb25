"""Probe: walked-window union count at bench scale (sizes walk_capacity).

Builds the bench scene, runs the plain forward, and reports the
walked-window census that the fused backward's lax.cond branches on
(ops/fused_raster.walked_window_mask)."""
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
    from threedgrut_tpu.model import gaussians as G
    from threedgrut_tpu.render import gut
    from threedgrut_tpu.ops import fused_raster
    from threedgrut_tpu.ops.pallas import tile_raster
    from threedgrut_tpu import constants as C
    from threedgrut_tpu.datasets.dataset_synthetic import look_at
    from threedgrut_tpu.cameras import pose_from_matrix
    from __graft_entry__ import _example_camera

    n, res, cap = 1_000_000, (800, 800), 2917888
    rng = np.random.default_rng(0)
    pos = rng.normal(0, 1.0, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.log(np.exp(rng.uniform(np.log(0.004), np.log(0.02),
                                       size=(n, 3)))).astype(np.float32)
    density = np.full((n, 1), 0.0, np.float32)
    albedo = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    spec = np.zeros((n, 45), np.float32)
    params = G.from_arrays(pos, quats, scales, density, albedo, spec)

    cam = _example_camera(res)
    T = jnp.asarray(look_at(np.array([0., -4.0, 1.0], np.float32),
                            np.zeros(3, np.float32),
                            np.array([0., 0., 1.], np.float32)))
    pose = pose_from_matrix(T)

    @jax.jit
    def probe(g):
        proj, binning, data_sorted, tile_grid = gut.prepare(
            g.get_positions(), g.get_rotation(), g.get_scale(),
            g.get_density(), g.get_features(), cam, pose, res, cap)
        rays = gut.packed_world_rays(cam, pose, tile_grid, T)
        out = tile_raster._forward(
            data_sorted, binning.tile_starts, binning.tile_ends, rays,
            degree=C.KERNEL_DEGREE_3DGUT,
            min_transmittance=C.MIN_TRANSMITTANCE_3DGUT,
            min_response=C.MIN_KERNEL_RESPONSE,
            min_alpha=C.MIN_ALPHA, max_alpha=C.MAX_ALPHA)
        wmask, cnt = fused_raster.walked_window_mask(
            out, binning.tile_starts, cap // tile_raster.CHUNK)
        return cnt, jnp.sum(out[:, 7, 0]), binning.num_intersections

    cnt, walked_slots, total = probe(params)
    nw = cap // tile_raster.CHUNK
    print(f"windows: {nw}, walked-union: {int(cnt)} "
          f"({100.0 * int(cnt) / nw:.1f}%)")
    print(f"walked slots (sum over tiles): {int(walked_slots)} "
          f"({100.0 * int(walked_slots) / cap:.1f}% of cap), "
          f"true isects {int(total)}")
    frac = 0.625
    wc = -(-int(cap * frac) // 256) * 256
    print(f"walk_capacity at frac {frac}: {wc} ({wc // 128} windows) -> "
          f"{'COMPACT' if int(cnt) <= wc // 128 else 'DENSE fallback'}")


if __name__ == "__main__":
    main()
