"""Multi-chip training: views x tiles x particles over a 3D device mesh.

The reference is strictly single-GPU (SURVEY.md §2.10 — no NCCL/MPI/
torch.distributed anywhere); this module is new TPU-native capability per the
BASELINE north star: rays/tiles sharded across chips, Gaussian parameters
replicated, gradient all-reduce over ICI.

Mesh axes:
  * "data": batch of views per step — each data-row renders a different
    camera (true multi-view batching; the reference is batch_size=1).
  * "tile": 16x16 pixel tiles of one view sharded across chips (the
    sequence-parallel analogue — rays are the long axis, SURVEY.md §5.7).
  * "model": particles sharded for projection + SH + packing (the
    tensor-parallel analogue — per-particle work scales with N); results are
    all-gathered over ICI before the (replicated) sort and the tile-sharded
    compositing, which both need the full splat set.

Design: parameters and optimizer state are replicated (in_specs P()); every
gradient path reaches parameters through this device's own tile strip AND
exactly one model-axis all_gather, so after `psum` over all three axes the
gradient equals the single-device gradient exactly (verified in tests); a
replicated Adam step keeps parameters identical on all chips. The per-device
loss carries 1/(B*T*M) because each all_gather transpose (a psum_scatter)
sums the identical per-replica cotangents.
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
from threedgrut_tpu.ops import projection as proj_ops
from threedgrut_tpu.ops import tiles as tile_ops
from threedgrut_tpu.ops.pallas import tile_raster
from threedgrut_tpu.ops.sorted_gather import sorted_gather
from threedgrut_tpu.render import gut
from threedgrut_tpu.render.gut_reference import (camera_center_world,
                                                 precomputed_features)


def make_mesh(n_devices: int | None = None,
              tile_parallel: int | None = None,
              model_parallel: int = 1) -> Mesh:
    """Factor the devices into (data, tile, model)."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devs)
    if tile_parallel is None:
        tile_parallel = n // model_parallel
    assert n % (tile_parallel * model_parallel) == 0
    import numpy as np
    arr = np.asarray(devs).reshape(n // (tile_parallel * model_parallel),
                                   tile_parallel, model_parallel)
    return Mesh(arr, ("data", "tile", "model"))


ALL_AXES = ("data", "tile", "model")


def make_dp_train_step(cfg: Config, mesh: Mesh, resolution: Tuple[int, int],
                       sh_degree: int, debug_grads: bool = False,
                       isect_capacity: int | None = None):
    """Build the jitted multi-chip train step.

    Call signature of the returned fn:
      (params, opt_state, Ts [B,4,4], cameras (stacked pytree [B,...]),
       gts [B,H,W,3], keys [B,2], scene_extent) ->
      (params, opt_state, metrics dict)
    where B == mesh.shape['data'].
    """
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    n_model = mesh.shape.get("model", 1)
    wp, hp = gut.pad_to_tiles(resolution)
    tile_grid = (wp // C.TILE_X, hp // C.TILE_Y)
    num_tiles = tile_grid[0] * tile_grid[1]
    assert num_tiles % n_tile == 0, (
        f"{num_tiles} tiles not divisible by tile axis {n_tile}")
    t_local = num_tiles // n_tile
    w, h = resolution
    if isect_capacity is None:
        isect_capacity = cfg.render.isect_capacity

    def device_fn(params: Gaussians, opt_state, T, camera, gt, key, extent):
        # Per-device operands: T [1,4,4], gt [1,H,W,3], key [1,2].
        T = T[0]
        gt = gt[0]
        key = key[0]
        camera = jax.tree.map(lambda x: x[0], camera)
        pose = pose_from_matrix(T)
        tidx = jax.lax.axis_index("tile")
        midx = jax.lax.axis_index("model")

        def loss_fn(fields: Dict[str, jnp.ndarray]):
            p = params.replace(**fields)
            pos, quats, scales, opac, feats = (
                p.get_positions(), p.get_rotation(), p.get_scale(),
                p.get_density(), p.get_features())

            cap_n = pos.shape[0]
            assert cap_n % n_model == 0
            shard_n = cap_n // n_model

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(
                    x, midx * shard_n, shard_n, 0)

            # Per-particle work sharded over "model", gathered over ICI.
            proj_l = proj_ops.project(sl(pos), sl(quats), sl(scales),
                                      sl(opac), camera, pose, 0, resolution)
            proj = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "model", axis=0, tiled=True),
                proj_l)
            cam_center = camera_center_world(pose)
            colors_l = precomputed_features(sl(pos), sl(feats), cam_center,
                                            sh_degree)
            packed_l = gut.pack_particles(sl(pos), sl(quats), sl(scales),
                                          sl(opac), colors_l)
            packed = jax.lax.all_gather(packed_l, "model", axis=0,
                                        tiled=True)

            binning = tile_ops.bin_particles(
                proj, tile_grid, isect_capacity,
                tile_culling=cfg.render.tile_culling)
            data_sorted = sorted_gather(
                packed, binning.sorted_particle_idx,
                binning.particle_ends, binning.particle_counts,
                "bf16" if cfg.render.low_precision_grads else "f32")
            rays = gut.packed_world_rays(camera, pose, tile_grid, T)

            start = tidx * t_local
            starts_l = jax.lax.dynamic_slice(binning.tile_starts, (start,),
                                             (t_local,))
            ends_l = jax.lax.dynamic_slice(binning.tile_ends, (start,),
                                           (t_local,))
            rays_l = jax.lax.dynamic_slice(
                rays, (start, 0, 0), (t_local, 8, tile_raster.PIX))

            # Train-step loss reads only rgb + opacity: skip the depth/
            # transmittance cotangent chains AND the depth/hit-count
            # forward math (same flags as the single-chip trainer).
            out_l = tile_raster.tile_composite(
                data_sorted, starts_l, ends_l, rays_l,
                cfg.render.particle_kernel_degree,
                cfg.render.min_transmittance,
                aux_grads=False, aux_outputs=False)
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
            # The loss is computed identically on every replica of each
            # all_gathered tensor; each gather transpose SUMS those
            # cotangents, so normalize once per replicated axis.
            scale = n_data * n_tile * n_model
            return loss / scale, (terms, visibility, binning.overflow, pred)

        fields = {f: getattr(params, f) for f in optimizers.PARAM_FIELDS}
        (loss, (terms, visibility, overflow, pred)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(fields))
        grads = jax.lax.psum(grads, ALL_AXES)
        # Visibility across the view batch: a particle visible in any view,
        # refined to hit-based via nonzero gradient (see trainer._step_fn).
        visibility = jax.lax.psum(visibility.astype(jnp.int32),
                                  ALL_AXES) > 0
        hit_vis = jnp.zeros_like(visibility)
        for f in optimizers.PARAM_FIELDS:
            g = grads[f].reshape(visibility.shape[0], -1)
            hit_vis = hit_vis | jnp.any(g != 0.0, axis=-1)
        visibility = visibility & hit_vis
        new_params, new_opt = optimizers.step(
            params, params.replace(**grads, alive=params.alive), opt_state,
            cfg.optimizer, extent, visibility=visibility)
        metrics = dict(
            loss=jax.lax.psum(loss, ALL_AXES),
            psnr=jax.lax.psum(losses.psnr(pred, gt), "data") / n_data,
            overflow=jax.lax.psum(overflow.astype(jnp.int32), ALL_AXES) > 0,
            # Densification signal (GSStrategy.accumulate): the psum'd grads
            # already aggregate the view batch, matching the single-chip
            # accumulation applied once per step.
            pos_grad_norm=jnp.linalg.norm(grads["positions"], axis=-1),
            visibility=visibility,
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
