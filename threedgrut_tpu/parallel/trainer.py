"""Multi-chip trainer: the product path over the (data, tile, model) mesh.

Wraps parallel/dp.py's sharded train step in the full Trainer surface —
epoch loop, densification strategies on replicated state, adaptive
intersection capacity, checkpoint/resume, validation — so `train.py
--multichip D,T,M` trains end-to-end on a mesh. The reference has no
distributed trainer at all (SURVEY.md §2.10); semantics here extend the
single-chip Trainer: one global step consumes `data`-axis-many views
(true multi-view batching, reference is batch_size=1), with gradients
psum'd so each step equals a sum over the view batch.

Strategy hooks run on the host exactly as in the single-chip Trainer: the
strategy's jitted updates receive replicated params/opt-state and produce
replicated outputs (XLA propagates the sharding), so densification needs
no distributed-specific code.
"""
from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.config import Config
from threedgrut_tpu.model.gaussians import Gaussians
from threedgrut_tpu.parallel import dp
from threedgrut_tpu.trainer import Trainer


class DPTrainer(Trainer):
    """Data/tile/model-parallel trainer over a jax.sharding.Mesh.

    `mesh_shape` is (data, tile, model); the product must divide the
    available device count. Validation and checkpointing reuse the
    single-chip paths (replicated arrays behave as ordinary arrays there).
    """

    def __init__(self, cfg: Config, dataset, val_dataset=None,
                 params: Optional[Gaussians] = None, strategy=None,
                 writer=None, mesh_shape: Tuple[int, int, int] = None,
                 mesh=None):
        super().__init__(cfg, dataset, val_dataset, params=params,
                         strategy=strategy, writer=writer)
        if mesh is None:
            d, t, m = mesh_shape or (1, len(jax.devices()), 1)
            mesh = dp.make_mesh(n_devices=d * t * m, tile_parallel=t,
                                model_parallel=m)
        self.mesh = mesh
        self.batch = mesh.shape["data"]
        if params is not None:
            self.params = dp.replicate(self.params, mesh)
            self.opt_state = dp.replicate(self.opt_state, mesh)
        self._steps: Dict[tuple, object] = {}
        # Deferred overflow flag (same contract as Trainer.train_step): the
        # host readback of the PREVIOUS step's flag overlaps the current
        # step's device compute — an immediate bool() on device data would
        # cost a full remote-tunnel round trip every step.
        self._pending_overflow = None

    def _dp_step(self, resolution, sh_degree):
        key = (resolution, sh_degree, self.isect_capacity)
        if key not in self._steps:
            self._steps[key] = dp.make_dp_train_step(
                self.cfg, self.mesh, resolution, sh_degree,
                isect_capacity=self.isect_capacity)
        return self._steps[key]

    def _stack_views(self, views):
        Ts = jnp.stack([jnp.asarray(v.T_to_world) for v in views])
        cams = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[v.camera for v in views])
        gts = jnp.stack([jnp.asarray(v.rgb_gt) for v in views])
        return Ts, cams, gts

    def train_step_batch(self, views) -> Dict[str, float]:
        assert len(views) == self.batch
        res = views[0].resolution
        Ts, cams, gts = self._stack_views(views)
        self.key, *subs = jax.random.split(self.key, self.batch + 1)
        keys = jnp.stack(subs)
        step_fn = self._dp_step(res, self.active_sh_degree())
        Ts, cams, gts, keys = (dp.shard_batch(x, self.mesh)
                               for x in (Ts, cams, gts, keys))
        self.params, self.opt_state, metrics = step_fn(
            self.params, self.opt_state, Ts, cams, gts, keys,
            jnp.float32(self.scene_extent))
        self.global_step += 1
        # Read the overflow flag one step LATE (see __init__): the step that
        # overflowed is slightly truncated; the next step retraces with
        # doubled capacity. Mirrors Trainer.train_step:229-239.
        prev_ovf, self._pending_overflow = (self._pending_overflow,
                                            metrics["overflow"])
        if prev_ovf is not None and bool(prev_ovf):
            self.isect_capacity *= 2
            print(f"isect overflow at step {self.global_step - 1}; capacity "
                  f"-> {self.isect_capacity}", flush=True)
            # The step just dispatched also ran at the OLD capacity; its flag
            # reports the same shortage — drop it to avoid double-doubling.
            self._pending_overflow = None
        if self.strategy is not None:
            aux = dict(pos_grad_norm=metrics["pos_grad_norm"],
                       visibility=metrics["visibility"],
                       overflow=metrics["overflow"])
            self.strategy.post_backward(self, views[0], aux)
            self.strategy.post_optimizer_step(self, views[0], aux)
        return metrics

    # The single-view API delegates so inherited helpers keep working
    # (a batch is formed by repeating the view across the data axis).
    def train_step(self, view):
        return self.train_step_batch([view] * self.batch)

    def run(self, iterations: Optional[int] = None, log_every: int = 100,
            out_dir: Optional[str] = None):
        from threedgrut_tpu.datasets.protocols import iterate_epochs
        iters = iterations or self.cfg.train.iterations
        stream = iterate_epochs(len(self.dataset), self.cfg.train.seed)
        t0 = time.time()
        for _ in range(iters):
            views = [self.dataset[next(stream)] for _ in range(self.batch)]
            metrics = self.train_step_batch(views)
            if log_every and self.global_step % log_every == 0:
                rate = self.global_step / (time.time() - t0)
                print(f"step {self.global_step:6d} "
                      f"loss {float(metrics['loss']):.4f} "
                      f"psnr {float(metrics['psnr']):.2f} it/s {rate:.1f}",
                      flush=True)
                if self.writer is not None:
                    self.writer.scalar("train/loss", float(metrics["loss"]),
                                       self.global_step)
                    self.writer.scalar("train/psnr", float(metrics["psnr"]),
                                       self.global_step)
            if out_dir and self.global_step in \
                    self.cfg.train.checkpoint_iterations:
                self.save_checkpoint(out_dir)
            if (self.cfg.train.val_frequency and self.val_dataset is not None
                    and self.global_step % self.cfg.train.val_frequency == 0):
                print(f"val @ {self.global_step}: {self.validate()}",
                      flush=True)
        if out_dir:
            self.save_checkpoint(out_dir, name="ckpt_last")
        return self

    @classmethod
    def load_checkpoint(cls, path: str, dataset=None, val_dataset=None,
                        strategy=None, mesh_shape=None) -> "DPTrainer":
        base = Trainer.load_checkpoint(path, dataset=dataset,
                                       val_dataset=val_dataset,
                                       strategy=strategy)
        tr = cls(base.cfg, dataset, val_dataset, params=base.params,
                 strategy=strategy, mesh_shape=mesh_shape)
        tr.opt_state = dp.replicate(base.opt_state, tr.mesh)
        tr.global_step = base.global_step
        tr.scene_extent = base.scene_extent
        tr.isect_capacity = base.isect_capacity
        if strategy is not None and getattr(base.strategy, "state", None):
            tr.strategy.state = base.strategy.state
        return tr
