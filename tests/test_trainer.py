"""End-to-end training slice: synthetic scene, tiny resolution, PSNR must rise
and checkpoints must round-trip."""
import numpy as np
import pytest

from threedgrut_tpu.config import Config, apply_override, from_dict, make, to_dict
from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset
from threedgrut_tpu.model import gaussians
from threedgrut_tpu.trainer import Trainer


@pytest.fixture(scope="module")
def dataset():
    return SyntheticDataset(num_views=6, resolution=(32, 32),
                            num_gt_gaussians=48, seed=3)


def make_trainer(dataset, **opt):
    cfg = Config()
    cfg.render.isect_capacity = 1 << 14
    cfg.model.progressive_sh_interval = 10
    cfg.train.seed = 0
    for k, v in opt.items():
        apply_override(cfg, f"{k}={v}")
    pts = np.asarray(dataset.scene[0]) + np.random.default_rng(7).normal(
        0, 0.05, dataset.scene[0].shape).astype(np.float32)
    params = gaussians.init_from_points(pts, capacity=64)
    return Trainer(cfg, dataset, val_dataset=dataset, params=params)


def test_training_improves_psnr(dataset):
    tr = make_trainer(dataset)
    before = tr.validate()["psnr"]
    tr.run(iterations=60, log_every=0)
    after = tr.validate()["psnr"]
    assert after > before + 1.0, (before, after)


def test_checkpoint_roundtrip(tmp_path, dataset):
    tr = make_trainer(dataset)
    tr.run(iterations=5, log_every=0)
    path = tr.save_checkpoint(str(tmp_path))
    tr2 = Trainer.load_checkpoint(path, dataset=dataset, val_dataset=dataset)
    assert tr2.global_step == tr.global_step
    np.testing.assert_array_equal(np.asarray(tr2.params.positions),
                                  np.asarray(tr.params.positions))
    np.testing.assert_array_equal(
        np.asarray(tr2.opt_state.exp_avg["positions"]),
        np.asarray(tr.opt_state.exp_avg["positions"]))
    # Training continues from the restored state without error.
    tr2.run(iterations=2, log_every=0)


def test_selective_adam_freezes_invisible(dataset):
    tr = make_trainer(dataset, **{"optimizer.selective": "true"})
    p0 = np.asarray(tr.params.positions).copy()
    aux = tr.train_step(dataset[0])
    vis = np.asarray(aux["visibility"])
    p1 = np.asarray(tr.params.positions)
    moved = np.abs(p1 - p0).sum(-1) > 0
    assert not moved[~vis].any()


def test_config_roundtrip():
    cfg = make("nerf_synthetic_3dgrt", overrides=["train.iterations=123"])
    assert cfg.render.method == "3dgrt"
    assert cfg.train.iterations == 123
    cfg2 = from_dict(to_dict(cfg))
    assert to_dict(cfg2) == to_dict(cfg)


def test_config_mcmc_and_sorted_presets():
    """The reference's apps/*_mcmc.yaml + paper base_sorted.yaml surfaces
    (VERDICT missing #4/#5)."""
    cfg = make("nerf_synthetic_3dgut_mcmc")
    assert cfg.strategy.method == "mcmc"
    assert cfg.strategy.densify_end == 25000
    cfg = make("colmap_3dgrt_mcmc")
    assert cfg.render.method == "3dgrt" and cfg.strategy.method == "mcmc"
    # Selecting mcmc by override pulls in the mcmc window defaults too...
    cfg = make("colmap_3dgut", overrides=["strategy.method=mcmc"])
    assert cfg.strategy.densify_end == 25000
    # ...but an explicit densify_end override still wins.
    cfg = make("colmap_3dgut", overrides=["strategy.method=mcmc",
                                          "strategy.densify_end=9000"])
    assert cfg.strategy.densify_end == 9000
    cfg = make("nerf_synthetic_3dgut_sorted")
    assert cfg.render.k_buffer_passes == 16


def test_rolling_shutter_training(dataset):
    """Rolling-shutter views flow through the jitted step (slerped pose
    pair + shutter-time iteration inside the projector)."""
    import dataclasses
    import jax.numpy as jnp
    from threedgrut_tpu.cameras import ShutterType

    tr = make_trainer(dataset)
    v0 = dataset[0]
    v1 = dataset[1]
    rolling = dataclasses.replace(
        v0, shutter=ShutterType.ROLLING_TOP_TO_BOTTOM,
        pose_end=v1.T_to_world)
    aux = tr.train_step(rolling)
    assert np.isfinite(float(aux["terms"]["total"]))
    # The rolling-shutter image differs from the global-shutter one.
    aux_g = tr.eval_view(v0)
    aux_r = tr.eval_view(rolling)
    assert not np.allclose(np.asarray(aux_g["pred"]),
                           np.asarray(aux_r["pred"]), atol=1e-4)


def test_checkpoint_carries_strategy_state(tmp_path, dataset):
    """Densification buffers round-trip through checkpoints (reference saves
    densify_grad_norm_accum/denom)."""
    from threedgrut_tpu.strategy.gs import GSStrategy

    cfg = Config()
    cfg.render.isect_capacity = 1 << 14
    pts = np.asarray(dataset.scene[0])
    from threedgrut_tpu.model import gaussians as G
    params = G.init_from_points(pts, capacity=64)
    strat = GSStrategy(cfg.strategy, params.capacity)
    tr = Trainer(cfg, dataset, params=params, strategy=strat)
    tr.run(iterations=4, log_every=0)
    accum_before = np.asarray(strat.state.grad_accum)
    assert accum_before.sum() > 0
    path = tr.save_checkpoint(str(tmp_path))

    strat2 = GSStrategy(cfg.strategy, params.capacity)
    tr2 = Trainer.load_checkpoint(path, dataset=dataset, strategy=strat2)
    np.testing.assert_array_equal(np.asarray(strat2.state.grad_accum),
                                  accum_before)
    np.testing.assert_array_equal(np.asarray(strat2.state.grad_denom),
                                  np.asarray(strat.state.grad_denom))


def test_ray_jitter_training(dataset):
    """Sub-pixel AA jitter: enabled training steps run and produce slightly
    different renders per step (the reference dataset ray_jitter option)."""
    tr = make_trainer(dataset, **{"render.ray_jitter": "true"})
    aux1 = tr.train_step(dataset[0])
    assert np.isfinite(float(aux1["terms"]["total"]))
    # Eval (no jitter) still deterministic.
    a = tr.eval_view(dataset[0])
    b = tr.eval_view(dataset[0])
    np.testing.assert_array_equal(np.asarray(a["pred"]),
                                  np.asarray(b["pred"]))


def test_hit_based_visibility_occluded_invisible(dataset):
    """An in-frustum particle fully occluded by a nearer opaque particle
    must be INVISIBLE (reference referenceOptix.cu:158-161: the visibility
    flag is set during render on an accepted hit, not at projection)."""
    import jax.numpy as jnp
    from threedgrut_tpu.model.gaussians import Gaussians, from_arrays

    cfg = Config()
    cfg.render.isect_capacity = 1 << 12
    cfg.render.min_transmittance = 1e-4
    cfg.model.background_color = "black"
    # Two particles on the optical axis: a huge opaque one in front, a
    # small one right behind it. inverse_sigmoid(0.99) ~ 4.6.
    pos = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    quat = np.tile(np.array([1.0, 0, 0, 0], np.float32), (2, 1))
    scale = np.log(np.array([[1.0, 1.0, 1.0],
                             [0.01, 0.01, 0.01]], np.float32))
    dens = np.array([[9.0], [9.0]], np.float32)   # sigmoid -> ~1
    alb = np.full((2, 3), 0.5, np.float32)
    spec = np.zeros((2, 45), np.float32)
    params = from_arrays(pos, quat, scale, dens, alb, spec)
    tr = Trainer(cfg, dataset, params=params)
    view = dataset[0]  # camera at distance looking at origin from -y side
    aux = tr.train_step(view)
    vis = np.asarray(aux["visibility"])
    assert vis[0]          # the occluder rendered
    assert not vis[1]      # in-frustum but fully occluded -> invisible


def test_render_eval_from_checkpoint(tmp_path, dataset):
    """The proof/eval pipeline: train briefly, checkpoint, then
    Renderer.from_checkpoint + render_all with PNG dumps (including the
    best/worst pairs) — also with DEVICE-resident GT arrays, which the
    scale-proof dataset serves."""
    import jax.numpy as jnp
    from threedgrut_tpu.datasets.protocols import View
    from threedgrut_tpu.render_eval import Renderer

    tr = make_trainer(dataset)
    tr.run(iterations=3, log_every=0)
    tr.save_checkpoint(str(tmp_path), name="ckpt_eval")

    class DeviceGT:
        scene_extent = dataset.scene_extent

        def __len__(self):
            return 2

        def __getitem__(self, i):
            v = dataset[i]
            return View(camera=v.camera, T_to_world=v.T_to_world,
                        rgb_gt=jnp.asarray(v.rgb_gt),
                        resolution=v.resolution, mask=None)

    r = Renderer.from_checkpoint(str(tmp_path / "ckpt_eval.npz"), DeviceGT())
    out_dir = str(tmp_path / "renders")
    summary = r.render_all(out_dir=out_dir, save_gt=True,
                           compute_lpips=False)
    assert summary["n_frames"] == 2
    assert np.isfinite(summary["psnr"]) and np.isfinite(summary["ssim"])
    import os
    files = os.listdir(out_dir)
    assert "pred_0000.png" in files and "gt_0000.png" in files
    assert any(f.startswith("best_psnr_pred") for f in files)
    assert any(f.startswith("worst_psnr_gt") for f in files)
