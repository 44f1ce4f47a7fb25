"""Densification strategies: GS clone/split/prune and MCMC relocate/add/
perturb on capacity-padded buffers."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu import optimizers
from threedgrut_tpu.config import StrategyConfig
from threedgrut_tpu.model import gaussians
from threedgrut_tpu.strategy import gs, mcmc


def make_params(n=8, cap=16, seed=0, density=3.0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 1, (n, 3)).astype(np.float32)
    g = gaussians.init_from_points(pts, capacity=cap)
    return g.replace(density=jnp.full_like(g.density, density))


def test_gs_clone_and_split():
    params = make_params()
    opt = optimizers.init(params)
    state = gs.init_state(params.capacity)
    # Slot 0: high grad + small scale -> clone. Slot 1: high grad + large
    # scale -> split. Others low grad.
    accum = jnp.zeros(16).at[0].set(10.0).at[1].set(10.0)
    denom = jnp.ones(16, jnp.int32)
    state = gs.GSState(grad_accum=accum, grad_denom=denom,
                       rolling_vis=jnp.ones(16))
    scale = params.scale.at[1].set(jnp.log(2.0))  # large
    scale = scale.at[0].set(jnp.log(0.001))       # small
    params = params.replace(scale=scale)
    # moments nonzero to observe zeroing
    opt = opt._replace(exp_avg={k: v + 1.0 for k, v in opt.exp_avg.items()},
                       exp_avg_sq={k: v + 1.0
                                   for k, v in opt.exp_avg_sq.items()})

    p2, opt2, state2 = gs.densify(params, opt, state, jax.random.PRNGKey(0),
                                  jnp.float32(1.0), 2e-4, 0.01, 1.6)
    assert int(p2.num_active()) == 10  # 8 + 1 clone + 1 split
    # Split original moved and shrank.
    assert not np.allclose(np.asarray(p2.positions[1]),
                           np.asarray(params.positions[1]))
    np.testing.assert_allclose(np.asarray(p2.scale[1]),
                               np.asarray(params.scale[1]) - np.log(1.6),
                               atol=1e-6)
    # Clone original untouched, its moments kept.
    np.testing.assert_array_equal(np.asarray(p2.positions[0]),
                                  np.asarray(params.positions[0]))
    assert float(opt2.exp_avg["positions"][0, 0]) == 1.0
    # Split original's moments zeroed; new slots zeroed.
    assert float(opt2.exp_avg["positions"][1, 0]) == 0.0
    new_slots = np.asarray(p2.alive) & ~np.asarray(params.alive)
    assert new_slots.sum() == 2
    assert np.all(np.asarray(opt2.exp_avg["positions"])[new_slots] == 0.0)
    # One new slot is a copy of slot 0 (clone), one is near slot 1 (split).
    new_idx = np.where(new_slots)[0]
    new_pos = np.asarray(p2.positions)[new_idx]
    assert any(np.allclose(p, np.asarray(params.positions[0]))
               for p in new_pos)


def test_gs_prune_and_reset():
    params = make_params(density=3.0)
    opt = optimizers.init(params)
    state = gs.init_state(params.capacity)
    params = params.replace(density=params.density.at[2].set(-10.0))
    p2, _, _ = gs.prune(params, opt, state, 0.005)
    assert not bool(p2.alive[2])
    assert int(p2.num_active()) == 7

    p3 = gs.reset_density(params, 0.01)
    target = math.log(0.01 / 0.99)
    assert np.all(np.asarray(p3.density) <= target + 1e-6)


def test_gs_reset_ends_with_densify_window():
    """Density resets stop at densify_end (reference
    configs/strategy/gs.yaml:25-28 ties reset_density.end_iteration to
    densify.end_iteration; misc.py check_step_condition uses step < end).
    An unbounded reset collapses converged models every 3000 steps forever."""
    from threedgrut_tpu.config import Config

    cfg = Config().strategy
    strat = gs.GSStrategy(cfg, 16)

    class _T:  # minimal trainer stand-in
        params = make_params(density=3.0)
        opt_state = optimizers.init(params)
        key = jax.random.PRNGKey(0)
        scene_extent = 1.0

    for step, expect_reset in ((12000, True), (15000, False),
                               (18000, False), (30000, False)):
        t = _T()
        t.global_step = step
        before = np.asarray(t.params.density).copy()
        strat.post_optimizer_step(t, None, None)
        changed = not np.array_equal(before, np.asarray(t.params.density))
        assert changed == expect_reset, (step, changed)


def test_mcmc_relocation_correction_matches_kernel():
    """Golden test vs a direct python port of compute_relocation_kernel."""
    n_max = 51
    binoms = mcmc.binom_table(n_max)
    rng = np.random.default_rng(0)
    opacity = rng.uniform(0.01, 0.9, 10).astype(np.float32)
    scale = rng.uniform(0.01, 1.0, (10, 3)).astype(np.float32)
    ratio = rng.integers(1, 8, 10).astype(np.int32)

    new_op, new_scale = mcmc.relocation_correction(
        jnp.asarray(opacity), jnp.asarray(scale), jnp.asarray(ratio),
        binoms, n_max)

    bin_np = np.asarray(binoms)
    for m in range(10):
        nidx = int(ratio[m])
        ref_op = 1.0 - (1.0 - opacity[m]) ** (1.0 / nidx)
        denom = 0.0
        for i in range(1, nidx + 1):
            for k in range(0, i):
                denom += (bin_np[i - 1, k] * ((-1.0) ** k)
                          / math.sqrt(k + 1) * ref_op ** (k + 1))
        coeff = opacity[m] / denom
        np.testing.assert_allclose(float(new_op[m]), ref_op, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_scale[m]),
                                   coeff * scale[m], rtol=1e-4)


def test_mcmc_relocate():
    params = make_params(n=8, cap=16, density=3.0)
    opt = optimizers.init(params)
    # Make slots 0, 1 dead (low opacity).
    params = params.replace(
        density=params.density.at[0].set(-10.0).at[1].set(-10.0))
    binoms = mcmc.binom_table(51)
    p2, _ = mcmc.relocate(params, opt, jax.random.PRNGKey(0), 0.005, binoms)
    # Dead slots adopted some live particle's position.
    live_pos = np.asarray(params.positions[2:8])
    for i in (0, 1):
        d = np.abs(live_pos - np.asarray(p2.positions[i])).sum(-1).min()
        assert d < 1e-6
    # Relocated opacity is above the threshold.
    assert float(p2.get_density()[0]) > 0.005
    assert int(p2.num_active()) == 8  # count unchanged


def test_mcmc_add():
    params = make_params(n=8, cap=16, density=3.0)
    opt = optimizers.init(params)
    binoms = mcmc.binom_table(51)
    p2, _ = mcmc.add_gaussians(params, opt, jax.random.PRNGKey(1), 0.005,
                               binoms, jnp.int32(4))
    assert int(p2.num_active()) == 12


def test_mcmc_perturb_moves_transparent_more():
    params = make_params(n=8, cap=16, density=3.0)
    params = params.replace(
        density=params.density.at[0].set(-8.0))  # nearly transparent
    p2 = mcmc.perturb(params, jax.random.PRNGKey(2), jnp.float32(1e-3), 5e5)
    delta = np.abs(np.asarray(p2.positions - params.positions)).sum(-1)
    alive = np.asarray(params.alive)
    assert delta[0] > 0
    # Opaque particles barely move (gate ~ sigmoid(-99) ~ 0).
    assert np.all(delta[alive][1:] < delta[0] * 1e-3 + 1e-12)
    # Padding slots don't move.
    assert np.all(delta[~alive] == 0)


def test_gs_strategy_end_to_end():
    """GS strategy wired into a short training run."""
    from threedgrut_tpu.config import Config
    from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset
    from threedgrut_tpu.trainer import Trainer

    ds = SyntheticDataset(num_views=4, resolution=(32, 32),
                          num_gt_gaussians=24, seed=5)
    cfg = Config()
    cfg.render.isect_capacity = 1 << 12
    cfg.strategy.densify_start = 2
    cfg.strategy.densify_frequency = 5
    cfg.strategy.reset_density_frequency = 1000
    pts = np.asarray(ds.scene[0])
    params = gaussians.init_from_points(pts, capacity=64)
    strat = gs.GSStrategy(cfg.strategy, params.capacity)
    tr = Trainer(cfg, ds, params=params, strategy=strat)
    tr.run(iterations=12, log_every=0)
    assert int(tr.params.num_active()) >= 24
    assert np.isfinite(float(tr.params.positions.sum()))


def test_mcmc_strategy_end_to_end():
    from threedgrut_tpu.config import Config
    from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset
    from threedgrut_tpu.trainer import Trainer

    ds = SyntheticDataset(num_views=4, resolution=(32, 32),
                          num_gt_gaussians=24, seed=6)
    cfg = Config()
    cfg.render.isect_capacity = 1 << 12
    cfg.strategy.method = "mcmc"
    cfg.strategy.densify_start = 2
    cfg.strategy.mcmc_add_frequency = 5
    pts = np.asarray(ds.scene[0])
    params = gaussians.init_from_points(pts, capacity=64)
    strat = mcmc.MCMCStrategy(cfg.strategy, cfg.optimizer, params.capacity)
    tr = Trainer(cfg, ds, params=params, strategy=strat)
    tr.run(iterations=12, log_every=0)
    assert int(tr.params.num_active()) > 24  # grew 5%
    assert np.isfinite(float(tr.params.positions.sum()))


def test_gs_prune_scale():
    params = make_params(n=8, cap=16, density=3.0)
    # Particle 0 huge, others small; camera behind the scene looking +z.
    small = jnp.full_like(params.scale, jnp.log(0.01))
    params = params.replace(scale=small.at[0].set(jnp.log(5.0)))
    cam_pos = jnp.asarray([[0.0, 0.0, -5.0]])
    cam_fwd = jnp.asarray([[0.0, 0.0, 1.0]])
    p2 = gs.prune_scale(params, cam_pos, cam_fwd, jnp.float32(100.0), 30.0)
    assert not bool(p2.alive[0])
    assert int(p2.num_active()) == 7


def test_gs_prune_weight():
    """Weight-contribution prune: particles whose rolling hit-based
    contribution EMA fell below threshold are removed (reference
    gs.py:205-221 semantics with the kernel's accepted-hit flag)."""
    params = make_params(n=8, cap=16)
    state = gs.init_state(16)
    # Simulate 30 steps where slots 0..3 are hit, 4..7 never are.
    vis = jnp.zeros(16, bool).at[:4].set(True)
    grad = jnp.ones(16)
    cam = jnp.zeros(3)
    for _ in range(30):
        state = gs.accumulate(state, params, grad, cam, vis, 0.9)
    out = gs.prune_weight(params, state, threshold=0.5)
    alive = np.asarray(out.alive)
    assert alive[:4].all()                  # contributing slots kept
    assert not alive[4:8].any()             # never-hit slots pruned
    # EMA start at 1.0: a freshly added particle survives early steps.
    s2 = gs.init_state(16)
    s2 = gs.accumulate(s2, params, grad, cam, vis, 0.9)
    out2 = gs.prune_weight(params, s2, threshold=0.5)
    assert np.asarray(out2.alive)[:8].all()


def test_gs_density_decay():
    params = make_params(density=1.0)
    p2 = gs.decay_density(params, 0.5)
    np.testing.assert_allclose(
        np.asarray(p2.get_density()[np.asarray(params.alive)]),
        np.asarray(params.get_density()[np.asarray(params.alive)]) * 0.5,
        rtol=1e-5)
