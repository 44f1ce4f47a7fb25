"""Longer TPU training: 256x256, 24 views, GS densification to 16k capacity."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import time
import numpy as np

from threedgrut_tpu.config import Config
from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset
from threedgrut_tpu.model import gaussians
from threedgrut_tpu.strategy.gs import GSStrategy
from threedgrut_tpu.trainer import Trainer

import jax
print("backend:", jax.default_backend(), flush=True)

ds = SyntheticDataset(num_views=24, resolution=(256, 256),
                      num_gt_gaussians=256, seed=11)
cfg = Config()
cfg.render.isect_capacity = 1 << 18
cfg.model.progressive_sh_interval = 200
cfg.strategy.densify_start = 200
cfg.strategy.densify_frequency = 200
cfg.strategy.reset_density_frequency = 100000
pts = np.asarray(ds.scene[0]) + np.random.default_rng(5).normal(
    0, 0.15, ds.scene[0].shape).astype(np.float32)
params = gaussians.init_from_points(pts, capacity=16384)
strat = GSStrategy(cfg.strategy, params.capacity)
tr = Trainer(cfg, ds, val_dataset=ds, params=params, strategy=strat)
before = tr.validate()["psnr"]
t0 = time.time()
tr.run(iterations=2000, log_every=250)
dt = time.time() - t0
m = tr.validate()
print(f"PSNR {before:.2f} -> {m['psnr']:.2f} (ssim {m['ssim']:.3f}) "
      f"in {dt:.0f}s ({2000/dt:.1f} it/s), "
      f"particles {int(tr.params.num_active())}", flush=True)
