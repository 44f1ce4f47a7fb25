"""CLI acceptance regression (the results/acceptance pipeline in
miniature): train.py on the multi-sensor synthetic rig (fisheye + rolling
shutter + masks) with the MCMC preset, then render.py from the checkpoint
rebuilding the same procedural scene from the stored dataset config."""
import json
import os

import numpy as np


def test_train_render_cli_multi_sensor(tmp_path):
    import train as train_cli

    out = str(tmp_path)
    train_cli.main([
        "--config-name", "nerf_synthetic_3dgut_mcmc",
        "dataset.type=synthetic", "dataset.synthetic_views=6",
        "dataset.synthetic_resolution=48", "dataset.synthetic_gt=48",
        "dataset.synthetic_multi_sensor=True",
        "train.iterations=8", "train.val_frequency=8",
        "train.print_frequency=4",
        "render.isect_capacity=8192", "model.capacity=4096",
        f"out_dir={out}", "experiment_name=accept",
    ])
    run = os.path.join(out, "accept")
    assert os.path.exists(os.path.join(run, "ckpt_last.npz"))
    assert os.path.exists(os.path.join(run, "export_last.ply"))
    cfg = json.load(open(os.path.join(run, "ckpt_last.json")))
    assert cfg["dataset"]["synthetic_multi_sensor"] is True

    import render as render_cli
    rc = render_cli.main([
        "--checkpoint", os.path.join(run, "ckpt_last.npz"),
        "--out-dir", os.path.join(run, "eval"),
    ])
    assert rc == 0
    preds = [f for f in os.listdir(os.path.join(run, "eval"))
             if f.startswith("pred_")]
    assert len(preds) == 6
    from PIL import Image
    img = np.asarray(Image.open(
        os.path.join(run, "eval", sorted(preds)[0])))
    assert img.shape[:2] == (48, 48) and np.isfinite(img).all()
