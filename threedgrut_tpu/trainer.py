"""Training harness: jitted train/eval steps + the epoch loop.

Reference semantics: threedgrut/trainer.py (Trainer3DGRUT) — the hot loop of
run_train_pass (720-803): render -> 0.8*L1 + 0.2*DSSIM -> backward -> Adam ->
scheduler -> densification -> progressive SH; validation (805-842) computes
PSNR/SSIM; checkpoints carry params + optimizer state + config + step
(651-672). TPU-native design: the whole train step (forward, backward, and
optimizer update) is ONE jitted function specialized on (resolution, active SH
degree, render constants); there is no Python in the hot path and no
host<->device traffic besides the scalar metrics readback.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu import optimizers
from threedgrut_tpu.cameras import pose_from_matrix
from threedgrut_tpu.config import Config, from_dict, to_dict
from threedgrut_tpu.model import background, losses
from threedgrut_tpu.model.gaussians import Gaussians
from threedgrut_tpu.render import gut


def render_params(g: Gaussians):
    """Raw pytree -> post-activation render inputs (differentiable)."""
    return (g.get_positions(), g.get_rotation(), g.get_scale(),
            g.get_density(), g.get_features())


def _step_fn(params: Gaussians, opt_state, T_to_world, camera, rgb_gt,
               mask, key, scene_extent, resolution, sh_degree, cfg_key,
               train: bool, shutter=0, T_end=None, isect_capacity=None):
    from threedgrut_tpu.cameras import SensorPose, ShutterType
    cfg: Config = _CFG_REGISTRY[cfg_key]
    pose = pose_from_matrix(T_to_world)
    shutter = ShutterType(shutter)
    if isect_capacity is None:
        isect_capacity = cfg.render.isect_capacity
    if T_end is not None:
        pose_end = pose_from_matrix(T_end)
        pose = SensorPose(q_start=pose.q_start, t_start=pose.t_start,
                          q_end=pose_end.q_start, t_end=pose_end.t_start)

    def loss_fn(fields: Dict[str, jnp.ndarray]):
        p = params.replace(**fields)
        pos, quats, scales, opac, feats = render_params(p)
        if cfg.render.method == "3dgrt":
            from threedgrut_tpu.render import grt
            walk_cap = None
            if train and cfg.render.walk_compact_fraction > 0.0:
                walk_cap = -(-int(isect_capacity
                                  * cfg.render.walk_compact_fraction)
                             // 256) * 256
            out, overflow = grt.render(
                pos, quats, scales, opac, feats, camera, pose, resolution,
                sh_degree=sh_degree,
                kernel_degree=cfg.render.particle_kernel_degree,
                min_transmittance=cfg.render.min_transmittance,
                candidate_capacity=isect_capacity // 256,
                flat_capacity=isect_capacity,
                T_to_world=T_to_world,
                density_clamping=cfg.render.particle_kernel_density_clamping,
                surfel=cfg.render.surfel_primitive,
                walk_capacity=walk_cap)
        else:
            jit_px = None
            if train and cfg.render.ray_jitter:
                jkey = jax.random.fold_in(key, 1)
                jit_px = jax.random.uniform(
                    jkey, (resolution[1], resolution[0], 2))
            # Walked-window-compacted backward (only meaningful when a
            # backward will run): bound = fraction of capacity, 256-aligned;
            # gut.render falls back to the plain path when the bound is not
            # actually smaller than the capacity.
            walk_cap = None
            if train and cfg.render.walk_compact_fraction > 0.0:
                walk_cap = -(-int(isect_capacity
                                  * cfg.render.walk_compact_fraction)
                             // 256) * 256
            out, overflow = gut.render(
                pos, quats, scales, opac, feats, camera, pose, resolution,
                isect_capacity, shutter=shutter,
                sh_degree=sh_degree,
                kernel_degree=cfg.render.particle_kernel_degree,
                min_transmittance=cfg.render.min_transmittance,
                tile_culling=cfg.render.tile_culling,
                T_to_world=T_to_world, ray_jitter=jit_px,
                sorted_passes=cfg.render.k_buffer_passes,
                # The loss below reads only rgb (+opacity via background
                # compose) — skip depth/transmittance cotangent chains in
                # the Pallas backward; during training also skip the
                # depth/hit-count forward math (eval steps keep them for
                # the logged depth/hit panels).
                aux_gradients=False, aux_outputs=not train,
                low_precision_grads=cfg.render.low_precision_grads and train,
                row_termination=cfg.render.row_termination,
                # Eval reports the kernel's hit-based contributed bit
                # directly; train derives it from nonzero gradients below
                # (free) and must keep the differentiable path.
                hit_visibility=not train,
                walk_capacity=walk_cap)
        # Random background only during training (reference background.py:
        # 62-102 gates the per-pixel random color on model.training).
        pred = background.compose(out.rgb, out.opacity,
                                  cfg.model.background_color, train=train,
                                  key=key)
        loss, terms = losses.total_loss(
            pred, rgb_gt, cfg.loss.lambda_l1, cfg.loss.lambda_l2,
            cfg.loss.lambda_ssim, mask if cfg.loss.use_mask else None)
        return loss, (terms, out, overflow, pred)

    fields = {f: getattr(params, f) for f in optimizers.PARAM_FIELDS}
    if not train:
        loss, (terms, out, overflow, pred) = loss_fn(fields)
        return params, opt_state, dict(
            terms=terms, psnr=losses.psnr(pred, rgb_gt), pred=pred,
            visibility=out.visibility, overflow=overflow,
            opacity=out.opacity, depth=out.depth, hit_count=out.hit_count)

    (loss, (terms, out, overflow, pred)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(fields)
    # Hit-based visibility (reference referenceOptix.cu:158-161 /
    # gutProjector.cuh:275 set the flag on an ACCEPTED hit during render):
    # a particle composited with weight > 0 this frame. Derived for free
    # from the gradient — occluded or culled particles receive exactly-zero
    # cotangents through every path, so nonzero-gradient == contributed.
    # (Strictly: a contributing particle whose every cotangent is 0 is also
    # skipped; SelectiveAdam would only have decayed its moments.)
    hit_vis = jnp.zeros((params.capacity,), jnp.bool_)
    for f in optimizers.PARAM_FIELDS:
        g = grads[f].reshape(params.capacity, -1)
        hit_vis = hit_vis | jnp.any(g != 0.0, axis=-1)
    visibility = out.visibility & hit_vis
    new_params, new_opt = optimizers.step(
        params, params.replace(**grads, alive=params.alive), opt_state,
        cfg.optimizer, scene_extent, visibility=visibility)
    aux = dict(terms=terms, psnr=losses.psnr(pred, rgb_gt),
               visibility=visibility, overflow=overflow,
               pos_grad_norm=jnp.linalg.norm(grads["positions"], axis=-1))
    return new_params, new_opt, aux


_STATIC = ("resolution", "sh_degree", "cfg_key", "train", "shutter",
           "isect_capacity")
# Train steps donate params + optimizer state (the Adam update then writes
# in place instead of allocating fresh parameter/moment triples each step);
# eval steps must NOT donate — they return the same params, and callers keep
# using the original handles.
_step_impl_train = functools.partial(
    jax.jit, static_argnames=_STATIC, donate_argnums=(0, 1))(_step_fn)
_step_impl_eval = functools.partial(
    jax.jit, static_argnames=_STATIC)(_step_fn)


def _step_impl(params, opt_state, *args, train=False, **kw):
    fn = _step_impl_train if train else _step_impl_eval
    return fn(params, opt_state, *args, train=train, **kw)


# jit cannot hash dataclass configs with nested mutable fields; register them
# by id and pass a static key instead.
_CFG_REGISTRY: Dict[int, Config] = {}


def _register_cfg(cfg: Config) -> int:
    key = id(cfg)
    _CFG_REGISTRY[key] = cfg
    return key


class Trainer:
    """Single-accelerator trainer (the multi-chip path lives in parallel/)."""

    def __init__(self, cfg: Config, dataset, val_dataset=None,
                 params: Optional[Gaussians] = None, strategy=None,
                 writer=None):
        self.cfg = cfg
        self.cfg_key = _register_cfg(cfg)
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.strategy = strategy
        self.writer = writer
        self.scene_extent = float(dataset.scene_extent)
        self.global_step = 0
        self.params = params
        self.opt_state = optimizers.init(params) if params is not None else None
        self.key = jax.random.PRNGKey(cfg.train.seed)
        self.isect_capacity = cfg.render.isect_capacity
        self.stats: Dict[str, Any] = {}
        # Deferred overflow flag (see train_step): the host readback of the
        # previous step's flag overlaps the current step's device compute —
        # under the remote-TPU tunnel an immediate bool() would cost a full
        # ~25 ms round trip EVERY step.
        self._pending_overflow = None
        self._mask_cache: Dict[tuple, jnp.ndarray] = {}
        # Rolling log-point history for live GUIs (gui.TrainingGUI):
        # dicts of step/loss/psnr/particles/it_s, capped at 500 entries.
        self.history: list = []
        # Per-stage wall-clock accumulators since the last TB flush
        # (reference trainer.py: per-stage frame timings panel; host wall
        # time here — the jitted step is one device program).
        self._stage_s = {"data": 0.0, "step": 0.0, "strategy": 0.0}

    # ---- progressive SH (reference trainer.py:764-766, model.py:573-580) ----
    def active_sh_degree(self) -> int:
        if self.cfg.model.progressive_sh_interval <= 0:
            return self.cfg.model.max_sh_degree
        return min(self.cfg.model.n_active_features
                   + self.global_step // self.cfg.model.progressive_sh_interval,
                   self.cfg.model.max_sh_degree)

    def _view_arrays(self, view):
        if view.mask is not None:
            mask = jnp.asarray(view.mask)
        else:
            # Cache the all-ones mask per resolution: rebuilding + uploading
            # 2.5 MB through the tunnel every step is pure per-step tax.
            key = tuple(view.resolution)
            mask = self._mask_cache.get(key)
            if mask is None:
                mask = jnp.ones(view.resolution[::-1] + (1,), jnp.float32)
                self._mask_cache[key] = mask
        return (jnp.asarray(view.T_to_world), view.camera,
                jnp.asarray(view.rgb_gt), mask)

    def train_step(self, view) -> Dict[str, Any]:
        T, cam, gt, mask = self._view_arrays(view)
        self.key, sub = jax.random.split(self.key)
        T_end = (jnp.asarray(view.pose_end)
                 if getattr(view, "pose_end", None) is not None else None)
        self.params, self.opt_state, aux = _step_impl(
            self.params, self.opt_state, T, cam, gt, mask, sub,
            self.scene_extent, view.resolution, self.active_sh_degree(),
            self.cfg_key, train=True, shutter=int(getattr(view, "shutter", 0)),
            T_end=T_end, isect_capacity=self.isect_capacity)
        self.global_step += 1
        # Capacity growth on overflow (replaces the reference's grow-only
        # CudaBuffer + D2H count readback, gutRenderer.cu:300-321): the step
        # that overflowed is slightly truncated; subsequent steps retrace
        # with doubled capacity. The flag is read back one step LATE so the
        # transfer overlaps the next step's device compute (at most one
        # extra truncated step per growth event).
        prev_ovf, self._pending_overflow = (self._pending_overflow,
                                            aux["overflow"])
        if prev_ovf is not None and bool(prev_ovf):
            # Hard ceiling: the Pallas expansion packs slot/particle ids in
            # 24 bits (ops/pallas/expand.py) — growth clamps there and keeps
            # training with flagged truncation instead of crashing.
            cap_max = (1 << 24) - 256
            grown = min(self.isect_capacity * 2, cap_max)
            if grown == self.isect_capacity:
                print(f"isect overflow at step {self.global_step - 1}; "
                      f"capacity already at the 2^24 packing ceiling "
                      f"({cap_max}) — continuing with truncation",
                      flush=True)
            else:
                self.isect_capacity = grown
                print(f"isect overflow at step {self.global_step - 1}; "
                      f"capacity -> {self.isect_capacity}", flush=True)
            # The step just dispatched also ran at the OLD capacity; its
            # flag reports the same shortage we already responded to —
            # dropping it avoids a spurious second doubling.
            self._pending_overflow = None
        if self.strategy is not None:
            t_s = time.time()
            self.strategy.post_backward(self, view, aux)
            self.strategy.post_optimizer_step(self, view, aux)
            self._stage_s["strategy"] += time.time() - t_s
        return aux

    def eval_view(self, view) -> Dict[str, Any]:
        T, cam, gt, mask = self._view_arrays(view)
        T_end = (jnp.asarray(view.pose_end)
                 if getattr(view, "pose_end", None) is not None else None)
        # Grow-and-retry on overflow (the reference's grow-only CudaBuffer
        # re-renders after resize): a truncated eval image must never be
        # scored. Train steps instead accept one truncated step and double
        # for the NEXT step (train_step) — here the view is retried.
        for _ in range(8):
            _, _, aux = _step_impl(
                self.params, self.opt_state, T, cam, gt, mask,
                jax.random.PRNGKey(0), self.scene_extent, view.resolution,
                self.active_sh_degree(), self.cfg_key, train=False,
                shutter=int(getattr(view, "shutter", 0)), T_end=T_end,
                isect_capacity=self.isect_capacity)
            if not bool(aux["overflow"]):
                break
            self.isect_capacity *= 2
            print(f"isect overflow during eval; capacity -> "
                  f"{self.isect_capacity}", flush=True)
        return aux

    def validate(self) -> Dict[str, float]:
        ds = self.val_dataset or self.dataset
        psnrs, ssims, n_ovf = [], [], 0
        for i in range(len(ds)):
            aux = self.eval_view(ds[i])
            psnrs.append(float(aux["psnr"]))
            ssims.append(float(aux["terms"].get("ssim", jnp.nan)))
            n_ovf += int(bool(aux["overflow"]))
        out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
        if n_ovf:
            # A truncated eval render silently biases PSNR (the train loop
            # grows capacity on overflow; eval must at least report it).
            out["overflow_views"] = n_ovf
            print(f"WARNING: {n_ovf}/{len(ds)} val renders overflowed "
                  f"isect capacity {self.isect_capacity}", flush=True)
        return out

    def run(self, iterations: Optional[int] = None, log_every: int = 100,
            out_dir: Optional[str] = None):
        from threedgrut_tpu.datasets.protocols import iterate_epochs
        iters = iterations or self.cfg.train.iterations
        stream = iterate_epochs(len(self.dataset), self.cfg.train.seed)
        t0 = time.time()
        for _ in range(iters):
            t_d = time.time()
            view = self.dataset[next(stream)]
            t_s = time.time()
            self._stage_s["data"] += t_s - t_d
            aux = self.train_step(view)
            self._stage_s["step"] += time.time() - t_s
            if log_every and self.global_step % log_every == 0:
                loss = float(aux["terms"]["total"])
                psnr = float(aux["psnr"])
                rate = self.global_step / (time.time() - t0)
                print(f"step {self.global_step:6d} loss {loss:.4f} "
                      f"psnr {psnr:.2f} it/s {rate:.1f}", flush=True)
                self.history.append(dict(
                    step=self.global_step, loss=loss, psnr=psnr,
                    particles=int(self.params.num_active()), it_s=rate))
                del self.history[:-500]
                if self.writer is not None:
                    self.writer.scalars(aux["terms"], self.global_step,
                                        prefix="train/loss_")
                    self.writer.scalar("train/psnr", psnr, self.global_step)
                    self.writer.scalar("train/num_particles",
                                       int(self.params.num_active()),
                                       self.global_step)
                    self.writer.scalar("train/it_per_s", rate,
                                       self.global_step)
                    for k, v in self._stage_s.items():
                        self.writer.scalar(f"train/time_{k}_ms",
                                           1e3 * v / log_every,
                                           self.global_step)
                        self._stage_s[k] = 0.0
            if out_dir and self.global_step in self.cfg.train.checkpoint_iterations:
                self.save_checkpoint(out_dir)
            if (self.cfg.train.val_frequency
                    and self.global_step % self.cfg.train.val_frequency == 0
                    and self.val_dataset is not None):
                metrics = self.validate()
                print(f"val @ {self.global_step}: {metrics}", flush=True)
                if self.writer is not None:
                    self.writer.scalars(metrics, self.global_step,
                                        prefix="val/")
                    self.log_val_images()
        if out_dir:
            self.save_checkpoint(out_dir, name="ckpt_last")
        return self

    # ---- validation image panels (reference trainer.py:369-374, 484-497:
    # pred/gt plus hit-count and inverse-depth jet maps at fixed views) ----
    _VAL_VIEW_IDS = (0, 13, 27, 43, 78)

    def log_val_images(self) -> None:
        from threedgrut_tpu.utils.writer import jet_colormap
        ds = self.val_dataset or self.dataset
        for vid in self._VAL_VIEW_IDS:
            if vid >= len(ds):
                continue
            view = ds[vid]
            aux = self.eval_view(view)
            tagp = f"val_{vid}"
            self.writer.image(f"{tagp}/pred", np.asarray(aux["pred"]),
                              self.global_step)
            self.writer.image(f"{tagp}/gt", np.asarray(view.rgb_gt),
                              self.global_step)
            hits = np.asarray(aux["hit_count"])
            self.writer.image(
                f"{tagp}/hits_jet",
                jet_colormap(hits / max(1.0, float(hits.max()))),
                self.global_step)
            depth = np.asarray(aux["depth"])
            opacity = np.asarray(aux["opacity"])
            inv = np.where(depth > 1e-6, 1.0 / np.maximum(depth, 1e-6), 0.0)
            inv = inv / max(1e-6, float(inv.max()))
            self.writer.image(f"{tagp}/inv_depth_jet", jet_colormap(inv),
                              self.global_step)
            self.writer.image(f"{tagp}/opacity",
                              np.repeat(opacity[..., None], 3, -1),
                              self.global_step)

    # ---- checkpointing (reference trainer.py:651-672, model.py:107-134) ----
    def save_checkpoint(self, out_dir: str, name: Optional[str] = None):
        os.makedirs(out_dir, exist_ok=True)
        name = name or f"ckpt_{self.global_step}"
        path = os.path.join(out_dir, f"{name}.npz")
        flat = {}
        for f in dataclasses.fields(self.params):
            flat[f"params/{f.name}"] = np.asarray(getattr(self.params, f.name))
        for fname in optimizers.PARAM_FIELDS:
            flat[f"m/{fname}"] = np.asarray(self.opt_state.exp_avg[fname])
            flat[f"v/{fname}"] = np.asarray(self.opt_state.exp_avg_sq[fname])
        flat["opt_step"] = np.asarray(self.opt_state.step)
        flat["global_step"] = np.int64(self.global_step)
        flat["scene_extent"] = np.float64(self.scene_extent)
        # Persist the grown intersection capacity so a resumed run does not
        # re-suffer truncated (overflowed) steps until doubling catches up.
        flat["isect_capacity"] = np.int64(self.isect_capacity)
        # Densification buffers travel with the checkpoint (reference
        # trainer.py:651-672 saves densify_grad_norm_accum/denom).
        strat_state = getattr(self.strategy, "state", None)
        if strat_state is not None and dataclasses.is_dataclass(strat_state):
            for f in dataclasses.fields(strat_state):
                flat[f"strategy/{f.name}"] = np.asarray(
                    getattr(strat_state, f.name))
        # Atomic write: a process killed mid-save (remote-tunnel hangs are
        # killed by timeout) must never leave a truncated ckpt_last.npz —
        # resume loops depend on it being loadable.
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(to_dict(self.cfg), f, indent=2)
        return path

    @classmethod
    def load_checkpoint(cls, path: str, dataset=None, val_dataset=None,
                        strategy=None) -> "Trainer":
        data = np.load(path)
        cfg_path = path.replace(".npz", ".json")
        with open(cfg_path) as f:
            cfg = from_dict(json.load(f))
        pf = {f.name: jnp.asarray(data[f"params/{f.name}"])
              for f in dataclasses.fields(Gaussians)}
        params = Gaussians(**pf)
        trainer = cls(cfg, dataset, val_dataset, params=params,
                      strategy=strategy) if dataset is not None else \
            cls.__new__(cls)
        if dataset is None:
            trainer.cfg = cfg
            trainer.cfg_key = _register_cfg(cfg)
            trainer.dataset = None
            trainer.val_dataset = val_dataset
            trainer.strategy = strategy
            trainer.params = params
            trainer.key = jax.random.PRNGKey(cfg.train.seed)
            trainer.isect_capacity = cfg.render.isect_capacity
            trainer.writer = None
            trainer.stats = {}
            trainer._stage_s = {"data": 0.0, "step": 0.0, "strategy": 0.0}
            trainer._pending_overflow = None
            trainer._mask_cache = {}
            trainer.history = []
        trainer.opt_state = optimizers.AdamState(
            step=jnp.asarray(data["opt_step"]),
            exp_avg={f: jnp.asarray(data[f"m/{f}"])
                     for f in optimizers.PARAM_FIELDS},
            exp_avg_sq={f: jnp.asarray(data[f"v/{f}"])
                        for f in optimizers.PARAM_FIELDS})
        trainer.global_step = int(data["global_step"])
        trainer.scene_extent = float(data["scene_extent"])
        if "isect_capacity" in data:
            trainer.isect_capacity = int(data["isect_capacity"])
        strat_state = getattr(trainer.strategy, "state", None)
        if strat_state is not None and dataclasses.is_dataclass(strat_state):
            restored = {
                f.name: jnp.asarray(data[f"strategy/{f.name}"])
                for f in dataclasses.fields(strat_state)
                if f"strategy/{f.name}" in data}
            if restored:
                trainer.strategy.state = dataclasses.replace(strat_state,
                                                             **restored)
        return trainer
