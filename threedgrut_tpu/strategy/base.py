"""Strategy lifecycle interface.

Reference semantics: threedgrut/strategy/base.py:23-83 — pre/post-backward and
post-optimizer-step hooks that mutate parameters AND optimizer state together.
TPU-native difference: N never changes shape. Parameters live in fixed
capacity-padded buffers with an `alive` mask (model/gaussians.py), so
densification is a batch of masked writes executed inside one jitted update —
the reference's `_update_param_with_optimizer` tensor re-creation becomes a
scatter, and there is no retrace when the particle count changes.
"""
from __future__ import annotations

from typing import Any, Dict


class BaseStrategy:
    def post_backward(self, trainer, view, aux: Dict[str, Any]) -> None:
        """Called after gradients are computed (accumulate statistics)."""

    def post_optimizer_step(self, trainer, view, aux: Dict[str, Any]) -> None:
        """Called after the optimizer step (densify / prune / relocate)."""

    def wants_momentum_buffers(self) -> bool:
        return True


class NoOpStrategy(BaseStrategy):
    pass


def zero_opt_slots(opt_state, mask):
    """Zero Adam moments at slots selected by `mask` [C] (the reference
    zeroes optimizer state for cloned/split/relocated particles,
    strategy/base.py:52-83)."""
    import jax.numpy as jnp

    def z(d):
        return {k: jnp.where(mask.reshape((-1,) + (1,) * (v.ndim - 1)),
                             0.0, v) for k, v in d.items()}
    return opt_state._replace(exp_avg=z(opt_state.exp_avg),
                              exp_avg_sq=z(opt_state.exp_avg_sq))
