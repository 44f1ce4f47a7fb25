"""Per-parameter-group Adam for the Gaussians pytree, with SelectiveAdam.

Reference semantics:
  - per-group LRs + eps 1e-15 (configs/base_gs.yaml:81-106, model.py:491-546)
  - exponential positions-LR schedule scaled by scene extent
    (threedgrut/utils/misc.py:93-113)
  - SelectiveAdam: skip moment and parameter updates for Gaussians that were
    invisible this frame (threedgrut/optimizers/__init__.py:89-131 +
    optimizers.cu:46-115). On TPU this is a masked `where`, not a kernel.

The optimizer state is a plain pytree of per-field (exp_avg, exp_avg_sq)
arrays shaped like the parameters, so densification's optimizer-state surgery
(strategy/base.py:52-83 in the reference) becomes the same masked index update
used on the parameters themselves.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from threedgrut_tpu.model.gaussians import Gaussians

PARAM_FIELDS = ("positions", "rotation", "scale", "density",
                "features_albedo", "features_specular")


class AdamState(NamedTuple):
    step: jnp.ndarray                      # [] int32
    exp_avg: Dict[str, jnp.ndarray]
    exp_avg_sq: Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """LRs follow configs/base_gs.yaml:81-106. positions_lr is multiplied by
    the scene extent and decayed exponentially to positions_lr_final."""
    positions_lr: float = 1.6e-4
    positions_lr_final: float = 1.6e-6
    density_lr: float = 0.05
    features_albedo_lr: float = 2.5e-3
    features_specular_lr: float = 2.5e-3 / 20.0
    rotation_lr: float = 1e-3
    scale_lr: float = 5e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15
    max_steps: int = 30000
    selective: bool = False                # SelectiveAdam visibility gating


def positions_lr_schedule(cfg: OptimizerConfig, scene_extent: float, step):
    """Exponential interpolation lr_init -> lr_final over max_steps
    (reference misc.py:93-113, 'expon_lr' without delay)."""
    lr_init = cfg.positions_lr * scene_extent
    lr_final = cfg.positions_lr_final * scene_extent
    t = jnp.clip(step / cfg.max_steps, 0.0, 1.0)
    return jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)


def learning_rates(cfg: OptimizerConfig, scene_extent: float,
                   step) -> Dict[str, jnp.ndarray]:
    return {
        "positions": positions_lr_schedule(cfg, scene_extent, step),
        "rotation": jnp.float32(cfg.rotation_lr),
        "scale": jnp.float32(cfg.scale_lr),
        "density": jnp.float32(cfg.density_lr),
        "features_albedo": jnp.float32(cfg.features_albedo_lr),
        "features_specular": jnp.float32(cfg.features_specular_lr),
    }


def init(params: Gaussians) -> AdamState:
    zeros = {f: jnp.zeros_like(getattr(params, f)) for f in PARAM_FIELDS}
    return AdamState(step=jnp.int32(0),
                     exp_avg=zeros,
                     exp_avg_sq=jax.tree.map(jnp.copy, zeros))


def step(
    params: Gaussians,
    grads: Gaussians,
    state: AdamState,
    cfg: OptimizerConfig,
    scene_extent: float,
    visibility: Optional[jnp.ndarray] = None,
):
    """One Adam step. `visibility` [C] bool enables SelectiveAdam gating.

    Note the per-particle semantics of the reference CUDA kernel: invisible
    particles keep stale moments and an unchanged parameter; the bias
    correction uses the global step counter.
    """
    new_step = state.step + 1
    t = new_step.astype(jnp.float32)
    bc1 = 1.0 - cfg.beta1 ** t
    bc2 = 1.0 - cfg.beta2 ** t
    lrs = learning_rates(cfg, scene_extent, t)

    gate = None
    if cfg.selective and visibility is not None:
        gate = visibility.astype(jnp.float32)

    new_params = {}
    new_m = {}
    new_v = {}
    for f in PARAM_FIELDS:
        p = getattr(params, f)
        g = getattr(grads, f)
        m = state.exp_avg[f]
        v = state.exp_avg_sq[f]
        m_new = cfg.beta1 * m + (1.0 - cfg.beta1) * g
        v_new = cfg.beta2 * v + (1.0 - cfg.beta2) * (g * g)
        upd = lrs[f] * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + cfg.eps)
        if gate is not None:
            gf = gate.reshape((-1,) + (1,) * (p.ndim - 1))
            m_new = jnp.where(gf > 0, m_new, m)
            v_new = jnp.where(gf > 0, v_new, v)
            upd = upd * gf
        new_params[f] = p - upd
        new_m[f] = m_new
        new_v[f] = v_new

    out = params.replace(**new_params)
    return out, AdamState(step=new_step, exp_avg=new_m, exp_avg_sq=new_v)
