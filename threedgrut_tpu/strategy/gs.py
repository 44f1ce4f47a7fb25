"""Classic 3DGS densification: clone / split / prune / density reset.

Reference semantics: threedgrut/strategy/gs.py —
  * post_backward accumulates ||d L/d pos|| * distance-to-camera / 2 per
    visible particle (gs.py:104-115).
  * every `densify_frequency` steps in [start, end): clone small high-grad
    particles (exact copy appended, gs.py:180-203) and split large high-grad
    ones into `split_n` covariance-sampled samples with scale /(0.8*split_n)
    (gs.py:128-178; the original is removed).
  * prune by opacity < threshold (gs.py:246-260); density reset every 3000
    steps to <= reset value (configs/strategy/gs.yaml).

TPU-native: fixed-capacity buffers + alive mask; clone/split targets are
assigned to free slots with rank-matching scatters — one jitted update, no
reallocation, no retrace (SURVEY.md §7.2 step 6). Adam moments of new/split
slots are zeroed through the same masks (reference strategy/base.py:52-83).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from threedgrut_tpu.config import StrategyConfig
from threedgrut_tpu.model.gaussians import Gaussians
from threedgrut_tpu.optimizers import PARAM_FIELDS, AdamState
from threedgrut_tpu.strategy.base import BaseStrategy, zero_opt_slots


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GSState:
    grad_accum: jnp.ndarray   # [C]
    grad_denom: jnp.ndarray   # [C] int32
    rolling_vis: jnp.ndarray  # [C] EMA of hit-based contribution (the role
                              # of the reference's rolling_weight_contrib,
                              # gs.py:205-221)


def init_state(capacity: int) -> GSState:
    return GSState(grad_accum=jnp.zeros((capacity,), jnp.float32),
                   grad_denom=jnp.zeros((capacity,), jnp.int32),
                   rolling_vis=jnp.ones((capacity,), jnp.float32))


@jax.jit
def accumulate(state: GSState, params: Gaussians, pos_grad_norm: jnp.ndarray,
               cam_pos: jnp.ndarray, visibility: jnp.ndarray,
               vis_ema: float = 0.9) -> GSState:
    """pos_grad_norm: [C] = ||dL/dpos|| this step (trainer aux);
    visibility: [C] bool, the kernel's accepted-hit flag."""
    mask = (pos_grad_norm != 0.0) & params.alive
    dist = jnp.linalg.norm(params.positions - cam_pos, axis=-1)
    return GSState(
        grad_accum=state.grad_accum + jnp.where(
            mask, pos_grad_norm * dist * 0.5, 0.0),
        grad_denom=state.grad_denom + mask.astype(jnp.int32),
        rolling_vis=(vis_ema * state.rolling_vis
                     + (1.0 - vis_ema) * (visibility != 0).astype(
                         jnp.float32)),
    )


def _assign_free_slots(need: jnp.ndarray, free: jnp.ndarray):
    """Match the k-th needing source to the k-th free slot.

    Returns (take [C] bool over free slots actually used, src [C] int32 source
    slot for each free slot; arbitrary where not taken)."""
    c = need.shape[0]
    rank_src = jnp.cumsum(need.astype(jnp.int32)) - 1
    rank_free = jnp.cumsum(free.astype(jnp.int32)) - 1
    n_need = jnp.sum(need.astype(jnp.int32))
    src_of_rank = jnp.zeros((c,), jnp.int32).at[
        jnp.where(need, rank_src, c)].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop")
    take = free & (rank_free < n_need)
    src = src_of_rank[jnp.clip(rank_free, 0, c - 1)]
    return take, src


@jax.jit
def densify(params: Gaussians, opt_state: AdamState, state: GSState,
            key: jax.Array, scene_extent: jnp.ndarray,
            grad_threshold: float, scale_threshold: float,
            split_scale_factor: float):
    """One clone+split pass. Returns (params, opt_state, state)."""
    c = params.capacity
    grad_avg = jnp.where(state.grad_denom > 0,
                         state.grad_accum / jnp.maximum(state.grad_denom, 1),
                         0.0)
    grad_avg = jnp.nan_to_num(grad_avg)
    scales = params.get_scale()
    max_scale = jnp.max(scales, axis=-1)
    high = (grad_avg >= grad_threshold) & params.alive
    small = max_scale <= scale_threshold * scene_extent
    clone_mask = high & small
    split_mask = high & ~small

    need = clone_mask | split_mask
    take, src = _assign_free_slots(need, ~params.alive)

    # Covariance-sampled offsets for splits (reference gs.py:142-147):
    # offset = R @ (s * n), n ~ N(0, I).
    from threedgrut_tpu.ops import quaternion
    k1, k2 = jax.random.split(key)
    R = quaternion.to_rotation_matrix(params.get_rotation())     # [C, 3, 3]
    n1 = jax.random.normal(k1, (c, 3)) * scales
    n2 = jax.random.normal(k2, (c, 3)) * scales
    off_orig = jnp.einsum("nij,nj->ni", R, n1)
    off_new = jnp.einsum("nij,nj->ni", R, n2)
    split_scale = params.scale - jnp.log(split_scale_factor)

    # 1) Update split originals in place: sampled position, shrunk scale.
    new_positions = jnp.where(split_mask[:, None],
                              params.positions + off_orig, params.positions)
    new_scale = jnp.where(split_mask[:, None], split_scale, params.scale)

    # 2) Fill free slots from their sources (clone copy | split sample 2).
    def fill(field, value_for_split=None, value_plain=None):
        vals = value_plain if value_plain is not None else field
        gathered = vals[src]
        if value_for_split is not None:
            gathered = jnp.where(split_mask[src][:, None],
                                 value_for_split[src], gathered)
        m = take.reshape((-1,) + (1,) * (field.ndim - 1))
        return jnp.where(m, gathered, field)

    out = params.replace(
        positions=fill(new_positions,
                       value_for_split=params.positions + off_new,
                       value_plain=params.positions),
        scale=fill(new_scale, value_for_split=split_scale,
                   value_plain=params.scale),
        rotation=fill(params.rotation),
        density=fill(params.density),
        features_albedo=fill(params.features_albedo),
        features_specular=fill(params.features_specular),
        alive=params.alive | take,
    )

    # Zero Adam moments for new slots and split originals (reference zeroes
    # appended/split state; clones keep the original's state only on the
    # original slot).
    zero_mask = take | split_mask
    opt_state = zero_opt_slots(opt_state, zero_mask)
    return out, opt_state, init_state(c)


@jax.jit
def prune(params: Gaussians, opt_state: AdamState, state: GSState,
          density_threshold: float):
    keep = params.get_density() >= density_threshold
    alive = params.alive & keep
    return params.replace(alive=alive), opt_state, state


@jax.jit
def prune_scale(params: Gaussians, cam_positions: jnp.ndarray,
                cam_forward: jnp.ndarray, max_focal: jnp.ndarray,
                threshold: float):
    """Screen-size pruning (reference gs.py:224-244): remove particles whose
    projected min-scale/depth ratio exceeds `threshold` pixels for the
    nearest camera. cam_positions/[K,3], cam_forward [K,3] unit view dirs."""
    rel = params.positions[:, None, :] - cam_positions[None, :, :]
    depth = jnp.einsum("nkc,kc->nk", rel, cam_forward)
    min_depth = jnp.maximum(jnp.min(depth, axis=1), 1e-8)
    ratio = jnp.min(params.get_scale(), axis=1) / min_depth * max_focal
    keep = ratio < threshold
    return params.replace(alive=params.alive & keep)


@jax.jit
def prune_weight(params: Gaussians, state: GSState, threshold: float):
    """Weight-contribution pruning (reference gs.py:205-221): drop particles
    whose rolling contribution fell below `threshold`. The reference's
    `rolling_weight_contrib` buffer is referenced only at its prune site —
    here it is realized as an EMA of the Pallas kernel's per-particle
    accepted-hit flag (hit with blend weight > 0 this frame)."""
    keep = state.rolling_vis >= threshold
    return params.replace(alive=params.alive & keep)


@jax.jit
def decay_density(params: Gaussians, gamma: float):
    """density_logit <- logit(gamma * sigmoid(density)) — multiplicative
    opacity decay (reference gs.py decay_density hook)."""
    op = jax.nn.sigmoid(params.density) * gamma
    op = jnp.clip(op, 1e-6, 1.0 - 1e-6)
    return params.replace(density=jnp.log(op / (1.0 - op)))


@jax.jit
def reset_density(params: Gaussians, reset_value: float):
    """density <- min(density, inverse_sigmoid(reset_value))
    (reference gs.py:291-306)."""
    cap = jnp.log(reset_value / (1.0 - reset_value))
    return params.replace(density=jnp.minimum(params.density, cap))


class GSStrategy(BaseStrategy):
    def __init__(self, cfg: StrategyConfig, capacity: int):
        self.cfg = cfg
        self.state = init_state(capacity)

    def post_backward(self, trainer, view, aux) -> None:
        if trainer.global_step <= self.cfg.densify_end \
                or self.cfg.prune_weight_frequency > 0:
            cam_pos = jnp.asarray(view.T_to_world[:3, 3])
            self.state = accumulate(self.state, trainer.params,
                                    aux["pos_grad_norm"], cam_pos,
                                    aux["visibility"],
                                    self.cfg.prune_weight_ema)

    def _due(self, step: int, start: int, end: int, freq: int) -> bool:
        return freq > 0 and start <= step and (end < 0 or step < end) \
            and step % freq == 0

    def post_optimizer_step(self, trainer, view, aux) -> None:
        step = trainer.global_step
        if self._due(step, self.cfg.densify_start, self.cfg.densify_end,
                     self.cfg.densify_frequency):
            trainer.key, sub = jax.random.split(trainer.key)
            trainer.params, trainer.opt_state, self.state = densify(
                trainer.params, trainer.opt_state, self.state, sub,
                jnp.float32(trainer.scene_extent),
                self.cfg.densify_grad_threshold,
                self.cfg.densify_scale_threshold,
                0.8 * self.cfg.split_n)
            trainer.params, trainer.opt_state, self.state = prune(
                trainer.params, trainer.opt_state, self.state,
                self.cfg.prune_density_threshold)
        if self._due(step, self.cfg.prune_weight_start, -1,
                     self.cfg.prune_weight_frequency):
            trainer.params = prune_weight(trainer.params, self.state,
                                          self.cfg.prune_weight_threshold)
        # Density resets END with the densify window (reference
        # configs/strategy/gs.yaml:25-28 ties reset_density.end_iteration to
        # densify.end_iteration). An unbounded reset fires every 3000 steps
        # FOREVER and permanently collapses a converged model — a run whose
        # last step is a multiple of 3000 then checkpoints/evals the
        # collapsed state (this silently ruined a 30k-step at-scale proof).
        if self._due(step, self.cfg.reset_density_frequency,
                     self.cfg.densify_end,
                     self.cfg.reset_density_frequency):
            trainer.params = reset_density(trainer.params,
                                           self.cfg.reset_density_value)
        if (self.cfg.density_decay_frequency > 0
                and self._due(step, self.cfg.density_decay_frequency, -1,
                              self.cfg.density_decay_frequency)):
            trainer.params = decay_density(trainer.params,
                                           self.cfg.density_decay_gamma)
