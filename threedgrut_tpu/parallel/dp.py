"""Multi-chip training: views x tiles sharded over a 2D device mesh.

The reference is strictly single-GPU (SURVEY.md §2.10 — no NCCL/MPI/
torch.distributed anywhere); this module is new TPU-native capability per the
BASELINE north star: rays/tiles sharded across chips, Gaussian parameters
replicated, gradient all-reduce over ICI.

Mesh axes:
  * "data": batch of views per step — each data-row renders a different
    camera (true multi-view batching; the reference is batch_size=1).
  * "tile": 16x16 pixel tiles of one view sharded across chips (the
    sequence-parallel analogue — rays are the long axis, SURVEY.md §5.7).

Design: parameters and optimizer state are replicated (in_specs P()); each
device projects/sorts its view (replicated within a tile-row — projection is
~1% of compositing FLOPs) and composites only its tile shard; strips are
all-gathered over "tile" for the image-space SSIM loss; parameter gradients
are `psum` over BOTH axes (completing tile partial-grads and summing view
contributions), then a replicated Adam step keeps parameters identical on all
chips. Every gradient path reaches parameters through this device's own tile
strip, so the psum has no double counting.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from threedgrut_tpu import constants as C
from threedgrut_tpu import optimizers
from threedgrut_tpu.cameras import pose_from_matrix
from threedgrut_tpu.config import Config
from threedgrut_tpu.model import background, losses
from threedgrut_tpu.model.gaussians import Gaussians
from threedgrut_tpu.ops.pallas import tile_raster
from threedgrut_tpu.render import gut


def make_mesh(n_devices: int | None = None,
              tile_parallel: int | None = None) -> Mesh:
    """Factor the devices into (data, tile) — prefer tile-parallelism within
    a view (better load balance at batch 1) unless told otherwise."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devs)
    if tile_parallel is None:
        tile_parallel = n  # default: pure tile/ray sharding of one view
    assert n % tile_parallel == 0
    import numpy as np
    arr = np.asarray(devs).reshape(n // tile_parallel, tile_parallel)
    return Mesh(arr, ("data", "tile"))


def make_dp_train_step(cfg: Config, mesh: Mesh, resolution: Tuple[int, int],
                       sh_degree: int, debug_grads: bool = False):
    """Build the jitted multi-chip train step.

    Call signature of the returned fn:
      (params, opt_state, Ts [B,4,4], cameras (stacked pytree [B,...]),
       gts [B,H,W,3], keys [B,2], scene_extent) ->
      (params, opt_state, metrics dict)
    where B == mesh.shape['data'].
    """
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    wp, hp = gut.pad_to_tiles(resolution)
    tile_grid = (wp // C.TILE_X, hp // C.TILE_Y)
    num_tiles = tile_grid[0] * tile_grid[1]
    assert num_tiles % n_tile == 0, (
        f"{num_tiles} tiles not divisible by tile axis {n_tile}")
    t_local = num_tiles // n_tile
    w, h = resolution

    def device_fn(params: Gaussians, opt_state, T, camera, gt, key, extent):
        # Per-device operands: T [1,4,4], gt [1,H,W,3], key [1,2].
        T = T[0]
        gt = gt[0]
        key = key[0]
        camera = jax.tree.map(lambda x: x[0], camera)
        pose = pose_from_matrix(T)
        tidx = jax.lax.axis_index("tile")

        def loss_fn(fields: Dict[str, jnp.ndarray]):
            p = params.replace(**fields)
            pos, quats, scales, opac, feats = (
                p.get_positions(), p.get_rotation(), p.get_scale(),
                p.get_density(), p.get_features())
            proj, binning, data_sorted, _ = gut.prepare(
                pos, quats, scales, opac, feats, camera, pose, resolution,
                cfg.render.isect_capacity, sh_degree=sh_degree,
                tile_culling=cfg.render.tile_culling)
            rays = gut.packed_world_rays(camera, pose, tile_grid, T)

            start = tidx * t_local
            starts_l = jax.lax.dynamic_slice(binning.tile_starts, (start,),
                                             (t_local,))
            ends_l = jax.lax.dynamic_slice(binning.tile_ends, (start,),
                                           (t_local,))
            rays_l = jax.lax.dynamic_slice(
                rays, (start, 0, 0), (t_local, 8, tile_raster.PIX))

            out_l = tile_raster.tile_composite(
                data_sorted, starts_l, ends_l, rays_l,
                cfg.render.particle_kernel_degree,
                cfg.render.min_transmittance)
            out_full = jax.lax.all_gather(out_l, "tile", axis=0, tiled=True)

            img = gut.tile_unpack(out_full, tile_grid)[:h, :w]
            rgb, opacity = img[..., 0:3], img[..., 3]
            pred = background.compose(rgb, opacity,
                                      cfg.model.background_color,
                                      train=True, key=key)
            loss, terms = losses.total_loss(
                pred, gt, cfg.loss.lambda_l1, cfg.loss.lambda_l2,
                cfg.loss.lambda_ssim)
            visibility = proj.valid & (proj.n_tiles > 0)
            # Every tile-device computes the same image-space loss, and the
            # transpose of the all_gather (a psum_scatter) SUMS their
            # cotangents — divide by n_tile so the differentiated objective
            # is the mean view loss, once.
            return loss / (n_data * n_tile), (terms, visibility,
                                              binning.overflow, pred)

        fields = {f: getattr(params, f) for f in optimizers.PARAM_FIELDS}
        (loss, (terms, visibility, overflow, pred)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(fields))
        grads = jax.lax.psum(grads, ("data", "tile"))
        # Visibility across the view batch: a particle visible in any view.
        visibility = jax.lax.psum(visibility.astype(jnp.int32),
                                  ("data", "tile")) > 0
        new_params, new_opt = optimizers.step(
            params, params.replace(**grads, alive=params.alive), opt_state,
            cfg.optimizer, extent, visibility=visibility)
        # loss carries 1/(n_data*n_tile); psum over both axes -> mean view
        # loss, identical on every chip.
        metrics = dict(
            loss=jax.lax.psum(loss, ("data", "tile")),
            psnr=jax.lax.psum(losses.psnr(pred, gt), "data") / n_data,
            overflow=jax.lax.psum(overflow.astype(jnp.int32),
                                  ("data", "tile")) > 0,
        )
        if debug_grads:
            metrics["grads"] = grads
        return new_params, new_opt, metrics

    shard = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard(device_fn))


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over the whole mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(tree, mesh: Mesh):
    """Place leading-axis-batched arrays sharded over the data axis."""
    s = NamedSharding(mesh, P("data"))
    return jax.device_put(tree, s)
