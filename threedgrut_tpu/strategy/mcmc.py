"""3DGS-as-MCMC strategy: relocate dead, grow, perturb.

Reference semantics: threedgrut/strategy/mcmc.py + the relocation CUDA kernel
threedgrut/strategy/src/gaussian_mcmc.cu:33-101 —
  * relocate: dead particles (opacity <= threshold) move to multinomially
    sampled live particles (probability proportional to opacity); both source
    and relocated get corrected opacity 1-(1-a)^(1/n) and scale
    a / (sum_{i<=n} sum_{k<i} binom(i-1,k) (-1)^k a_new^{k+1}/sqrt(k+1)) * s
    (Eq. 9 of the MCMC paper).
  * add: grow 5% every 100 steps up to max_n, sampling sources the same way.
  * perturb: positions += Sigma @ (randn * sigmoid(k(threshold_shift - a)) *
    noise_lr * positions_lr) every step.

TPU-native: all three are single jitted masked updates on the fixed-capacity
buffers; the relocation math is a closed-form double sum over the static
binom_n_max (51) — no custom kernel needed (the CUDA kernel exists only
because torch could not fuse this loop).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from threedgrut_tpu.config import StrategyConfig
from threedgrut_tpu.model.gaussians import Gaussians
from threedgrut_tpu.optimizers import AdamState, OptimizerConfig, positions_lr_schedule
from threedgrut_tpu.ops import quaternion
from threedgrut_tpu.strategy.base import BaseStrategy, zero_opt_slots
from threedgrut_tpu.strategy.gs import _assign_free_slots


def binom_table(n_max: int) -> jnp.ndarray:
    return jnp.asarray([[math.comb(n, k) if k <= n else 0
                         for k in range(n_max)] for n in range(n_max)],
                       jnp.float32)


def relocation_correction(opacity: jnp.ndarray, scale: jnp.ndarray,
                          ratio: jnp.ndarray, binoms: jnp.ndarray,
                          n_max: int):
    """Vectorized port of compute_relocation_kernel (gaussian_mcmc.cu:33-71).

    opacity [M], scale [M, 3], ratio [M] int (clamped to [1, n_max]).
    Returns (new_opacity [M], new_scale [M, 3])."""
    ratio = jnp.clip(ratio, 1, n_max)
    new_op = 1.0 - jnp.power(1.0 - opacity, 1.0 / ratio)
    i = jnp.arange(1, n_max + 1)[:, None]          # [n_max, 1]
    k = jnp.arange(0, n_max)[None, :]              # [1, n_max]
    # term[i, k] = binom(i-1, k) * (-1)^k / sqrt(k+1) * new_op^(k+1), k <= i-1
    mask_ik = (k <= (i - 1)).astype(jnp.float32)   # [n_max, n_max]
    bin_ik = binoms[i - 1, k] * mask_ik
    sign = jnp.power(-1.0, k).astype(jnp.float32)
    inv_sqrt = 1.0 / jnp.sqrt(k + 1.0)
    pow_op = jnp.power(new_op[:, None], (k + 1.0))     # [M, n_max]
    inner = (bin_ik * sign * inv_sqrt)                 # [n_max(i), n_max(k)]
    # denom[m] = sum_{i=1..ratio_m} sum_k inner[i-1, k] * pow_op[m, k]
    per_i = pow_op @ inner.T                            # [M, n_max] (index i-1)
    i_mask = (jnp.arange(n_max)[None, :]
              < ratio[:, None]).astype(jnp.float32)
    denom = jnp.sum(per_i * i_mask, axis=-1)
    coeff = opacity / jnp.maximum(denom, 1e-12)
    return new_op, coeff[:, None] * scale


def _sample_sources(key, probs: jnp.ndarray, shape):
    """Multinomial-with-replacement sampling via categorical over log-probs."""
    logits = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-30)), -jnp.inf)
    return jax.random.categorical(key, logits, shape=shape)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.jit
def relocate(params: Gaussians, opt_state: AdamState, key: jax.Array,
             opacity_threshold: float, binoms: jnp.ndarray):
    """Move dead (alive but opacity <= threshold) to sampled live particles."""
    n_max = binoms.shape[0]
    c = params.capacity
    opacity = params.get_density()
    dead = params.alive & (opacity <= opacity_threshold)
    live = params.alive & (opacity > opacity_threshold)

    probs = jnp.where(live, opacity, 0.0)
    src = _sample_sources(key, probs, (c,))            # a source per slot
    # counts = number of dead draws landing on each source slot.
    counts = jnp.zeros((c,), jnp.int32).at[
        jnp.where(dead, src, c)].add(1, mode="drop")

    # Per-source correction with ratio = (#draws to this source) + 1; every
    # draw of the same source shares that ratio, so correcting once per slot
    # matches the reference's per-draw kernel. Sources are corrected first,
    # then dead slots copy the corrected source (mcmc.py:100-113).
    picked = counts > 0
    op_src, sc_src = relocation_correction(
        opacity, params.get_scale(), counts + 1, binoms, n_max)
    eps = jnp.finfo(jnp.float32).eps
    density_c = jnp.where(
        picked[:, None],
        inverse_sigmoid(jnp.clip(op_src, opacity_threshold,
                                 1.0 - eps))[:, None],
        params.density)
    scale_c = jnp.where(picked[:, None],
                        jnp.log(jnp.maximum(sc_src, 1e-12)), params.scale)

    dm = dead[:, None]
    out = params.replace(
        positions=jnp.where(dm, params.positions[src], params.positions),
        rotation=jnp.where(dm, params.rotation[src], params.rotation),
        features_albedo=jnp.where(dm, params.features_albedo[src],
                                  params.features_albedo),
        features_specular=jnp.where(dm, params.features_specular[src],
                                    params.features_specular),
        density=jnp.where(dm, density_c[src], density_c),
        scale=jnp.where(dm, scale_c[src], scale_c),
    )
    opt_state = zero_opt_slots(opt_state, picked)
    return out, opt_state


@jax.jit
def add_gaussians(params: Gaussians, opt_state: AdamState, key: jax.Array,
                  opacity_threshold: float, binoms: jnp.ndarray,
                  n_add: jnp.ndarray):
    """Grow by n_add particles sampled from the opacity distribution."""
    n_max = binoms.shape[0]
    c = params.capacity
    opacity = params.get_density()
    live = params.alive & (opacity > opacity_threshold)
    free = ~params.alive
    rank_free = jnp.cumsum(free.astype(jnp.int32)) - 1
    take = free & (rank_free < n_add)

    src = _sample_sources(key, jnp.where(live, opacity, 0.0), (c,))
    counts = jnp.zeros((c,), jnp.int32).at[
        jnp.where(take, src, c)].add(1, mode="drop")

    picked = counts > 0
    op_src, sc_src = relocation_correction(
        opacity, params.get_scale(), counts + 1, binoms, n_max)
    eps = jnp.finfo(jnp.float32).eps
    density_c = jnp.where(
        picked[:, None],
        inverse_sigmoid(jnp.clip(op_src, opacity_threshold,
                                 1.0 - eps))[:, None],
        params.density)
    scale_c = jnp.where(picked[:, None],
                        jnp.log(jnp.maximum(sc_src, 1e-12)), params.scale)

    tm = take[:, None]
    out = params.replace(
        positions=jnp.where(tm, params.positions[src], params.positions),
        rotation=jnp.where(tm, params.rotation[src], params.rotation),
        features_albedo=jnp.where(tm, params.features_albedo[src],
                                  params.features_albedo),
        features_specular=jnp.where(tm, params.features_specular[src],
                                    params.features_specular),
        density=jnp.where(tm, density_c[src], density_c),
        scale=jnp.where(tm, scale_c[src], scale_c),
        alive=params.alive | take,
    )
    # The reference's add_new_gaussians appends new gaussians with ZEROED
    # optimizer state and keeps the sources' moments (mcmc.py:138-142) —
    # unlike relocate, which zeroes the sources.
    opt_state = zero_opt_slots(opt_state, take)
    return out, opt_state


@jax.jit
def perturb(params: Gaussians, key: jax.Array, pos_lr: jnp.ndarray,
            noise_lr: float):
    """positions += Sigma @ (randn * sigmoid(-k(opacity - (1 - thr))) * lr)
    with k=100 (mcmc.py:150-166)."""
    opacity = params.get_density()
    gate = jax.nn.sigmoid(100.0 * ((1.0 - opacity) - 0.995))
    noise = (jax.random.normal(key, params.positions.shape)
             * gate[:, None] * noise_lr * pos_lr)
    R = quaternion.to_rotation_matrix(params.get_rotation())
    s2 = params.get_scale() ** 2
    cov = jnp.einsum("nij,nj,nkj->nik", R, s2, R)
    delta = jnp.einsum("nij,nj->ni", cov, noise)
    new_pos = jnp.where(params.alive[:, None],
                        params.positions + delta, params.positions)
    return params.replace(positions=new_pos)


class MCMCStrategy(BaseStrategy):
    def __init__(self, cfg: StrategyConfig, opt_cfg: OptimizerConfig,
                 capacity: int):
        self.cfg = cfg
        self.opt_cfg = opt_cfg
        self.binoms = binom_table(cfg.mcmc_binom_n_max)

    def post_optimizer_step(self, trainer, view, aux) -> None:
        step = trainer.global_step
        cfg = self.cfg
        # Relocation and growth share the GS densify window/frequency
        # (reference configs/strategy/mcmc.yaml: every 100 in [500, 25000];
        # preset_mcmc sets densify_end=25000 accordingly).
        if (step >= cfg.densify_start and step < cfg.densify_end
                and step % cfg.mcmc_add_frequency == 0):
            trainer.key, k1, k2 = jax.random.split(trainer.key, 3)
            trainer.params, trainer.opt_state = relocate(
                trainer.params, trainer.opt_state, k1,
                cfg.mcmc_opacity_threshold, self.binoms)
            n_alive = int(trainer.params.num_active())
            target = min(cfg.mcmc_max_gaussians, trainer.params.capacity,
                         int(1.05 * n_alive))
            n_add = max(0, target - n_alive)
            if n_add > 0:
                trainer.params, trainer.opt_state = add_gaussians(
                    trainer.params, trainer.opt_state, k2,
                    cfg.mcmc_opacity_threshold, self.binoms,
                    jnp.int32(n_add))
        # Position noise every step.
        trainer.key, kn = jax.random.split(trainer.key)
        pos_lr = positions_lr_schedule(self.opt_cfg, trainer.scene_extent,
                                       jnp.float32(step))
        trainer.params = perturb(trainer.params, kn, pos_lr,
                                 cfg.mcmc_noise_lr)
