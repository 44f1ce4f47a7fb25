#!/usr/bin/env python
"""Train CLI.

Mirrors the reference entry surface (train.py + Hydra, SURVEY.md Appendix A):
    python train.py --config-name nerf_synthetic_3dgut path=data/lego \
        out_dir=runs experiment_name=lego [any.config.key=value ...]
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-name", default="nerf_synthetic_3dgut",
                    help="preset name (see threedgrut_tpu.config.PRESETS)")
    ap.add_argument("--with-gui", action="store_true",
                    help="serve a live web viewer during training")
    ap.add_argument("--gui-port", type=int, default=8080)
    ap.add_argument("--multichip", metavar="D,T,M", default=None,
                    help="train on a device mesh: data,tile,model axis sizes "
                         "(e.g. 2,4,1 on 8 chips). One step consumes D views.")
    ap.add_argument("overrides", nargs="*",
                    help="dotted config overrides key=value; special keys: "
                         "path, out_dir, experiment_name, resume")
    args = ap.parse_args(argv)

    from threedgrut_tpu import config as config_mod
    special = {}
    dotted = []
    for ov in args.overrides:
        key = ov.split("=", 1)[0]
        if key in ("path", "out_dir", "experiment_name", "resume"):
            special[key] = ov.split("=", 1)[1]
        else:
            dotted.append(ov)
    cfg = config_mod.make(args.config_name, dotted)
    cfg.dataset.path = special.get("path", cfg.dataset.path)
    cfg.out_dir = special.get("out_dir", cfg.out_dir)
    cfg.experiment_name = special.get("experiment_name", cfg.experiment_name)
    cfg.resume = special.get("resume", cfg.resume)
    # Preset-name-derived dataset type is a DEFAULT only — an explicit
    # dataset.type=... override wins (it used to be silently clobbered).
    if not any(ov.startswith("dataset.type=") for ov in args.overrides):
        if "nerf" in args.config_name:
            cfg.dataset.type = "nerf"
        elif "scannetpp" in args.config_name:
            cfg.dataset.type = "scannetpp"
        elif "colmap" in args.config_name:
            cfg.dataset.type = "colmap"

    if not cfg.dataset.path and cfg.dataset.type != "synthetic":
        ap.error("dataset path required: path=/path/to/scene "
                 "(dataset.type=synthetic needs none)")

    from threedgrut_tpu import datasets, optimizers
    from threedgrut_tpu.model import gaussians
    from threedgrut_tpu.trainer import Trainer

    train_split = "train"
    val_split = "val" if cfg.dataset.type in ("colmap", "scannetpp") else "test"
    ds_kw = dict(downsample_factor=cfg.dataset.downsample_factor,
                 shutter_type=cfg.dataset.shutter_type)
    if cfg.dataset.type == "synthetic":
        r = cfg.dataset.synthetic_resolution
        ds_kw = dict(num_views=cfg.dataset.synthetic_views,
                     resolution=(r, r),
                     num_gt_gaussians=cfg.dataset.synthetic_gt,
                     multi_sensor=cfg.dataset.synthetic_multi_sensor)
    dataset = datasets.make(cfg.dataset.type, cfg.dataset.path,
                            split=train_split, **ds_kw)
    try:
        val_dataset = datasets.make(
            cfg.dataset.type, cfg.dataset.path, split=val_split, **ds_kw)
        if len(val_dataset) == 0:
            val_dataset = None
    except FileNotFoundError:
        val_dataset = None

    out_dir = os.path.join(cfg.out_dir, cfg.experiment_name)
    os.makedirs(out_dir, exist_ok=True)
    from threedgrut_tpu.utils.writer import MetricsWriter
    writer = MetricsWriter(cfg.out_dir, cfg.experiment_name)

    mesh_shape = None
    trainer_cls = Trainer
    if args.multichip:
        mesh_shape = tuple(int(x) for x in args.multichip.split(","))
        assert len(mesh_shape) == 3, "--multichip expects D,T,M"
        from threedgrut_tpu.parallel.trainer import DPTrainer
        trainer_cls = DPTrainer

    if cfg.resume:
        if trainer_cls is Trainer:
            trainer = Trainer.load_checkpoint(cfg.resume, dataset=dataset,
                                              val_dataset=val_dataset)
        else:
            trainer = trainer_cls.load_checkpoint(
                cfg.resume, dataset=dataset, val_dataset=val_dataset,
                mesh_shape=mesh_shape)
        trainer.writer = writer
    else:
        if hasattr(dataset, "initialization_points"):
            xyz, rgb = dataset.initialization_points()
            params = gaussians.init_from_points(
                xyz, colors=rgb,
                observer_points=dataset.observer_points,
                capacity=cfg.model.capacity)
        else:
            n_init = 100_000 if cfg.model.capacity is None else min(
                100_000, cfg.model.capacity)
            params = gaussians.init_random(
                n_init, max_sh_degree=cfg.model.max_sh_degree,
                capacity=cfg.model.capacity)
        strategy = None
        if cfg.strategy.method == "gs":
            from threedgrut_tpu.strategy.gs import GSStrategy
            strategy = GSStrategy(cfg.strategy, params.capacity)
        elif cfg.strategy.method == "mcmc":
            from threedgrut_tpu.strategy.mcmc import MCMCStrategy
            strategy = MCMCStrategy(cfg.strategy, cfg.optimizer,
                                    params.capacity)
        kw = dict(mesh_shape=mesh_shape) if trainer_cls is not Trainer else {}
        trainer = trainer_cls(cfg, dataset, val_dataset=val_dataset,
                              params=params, strategy=strategy,
                              writer=writer, **kw)

    gui = None
    if args.with_gui:
        from threedgrut_tpu.gui import TrainingGUI
        gui = TrainingGUI(trainer, port=args.gui_port)
    print(f"training {cfg.experiment_name}: {len(dataset)} views, "
          f"{int(trainer.params.num_active())} particles, "
          f"method={cfg.render.method}", flush=True)
    trainer.run(out_dir=out_dir)
    if gui is not None:
        gui.close()

    # Final export + test eval (reference trainer.on_training_end).
    from threedgrut_tpu.export.ply import export_ply
    export_ply(trainer.params, os.path.join(out_dir, "export_last.ply"))
    try:
        from threedgrut_tpu.export.ingp import export_ingp
        export_ingp(trainer.params, os.path.join(out_dir, "export_last.ingp"))
    except ImportError:
        pass
    try:
        from threedgrut_tpu.export.usdz import export_usdz
        export_usdz(trainer.params, os.path.join(out_dir, "export_last.usdz"),
                    dataset_poses=getattr(dataset, "_poses", None))
    except ImportError:
        pass
    if val_dataset is not None:
        from threedgrut_tpu.render_eval import Renderer
        summary = Renderer(trainer, val_dataset).render_all(
            out_dir=os.path.join(out_dir, "test_renders"),
            compute_lpips=False)
        print("final test:", summary, flush=True)
        writer.scalars(summary, trainer.global_step, prefix="test/")
    writer.close()
    print(f"done; artifacts in {out_dir}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
