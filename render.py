#!/usr/bin/env python
"""Render/eval CLI (reference render.py surface):
    python render.py --checkpoint ckpt.npz --path data/scene --out-dir out \
        [--save-gt] [--compute-extra-metrics]
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--path", default=None,
                    help="dataset path (default: the checkpoint's)")
    ap.add_argument("--dataset-type", default=None,
                    help="nerf|colmap|scannetpp|synthetic (default: the "
                         "checkpoint's)")
    ap.add_argument("--split", default="test")
    ap.add_argument("--out-dir", default="render_out")
    ap.add_argument("--save-gt", action="store_true")
    ap.add_argument("--compute-extra-metrics", action="store_true",
                    help="also compute LPIPS (host, torchmetrics)")
    args = ap.parse_args(argv)

    from threedgrut_tpu import datasets
    from threedgrut_tpu.render_eval import Renderer

    # The checkpoint carries the training config (reference render.py
    # restores conf from the checkpoint too) — CLI flags override it.
    import os
    ds_cfg = {}
    cfg_path = os.path.splitext(args.checkpoint)[0] + ".json"
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            ds_cfg = json.load(f).get("dataset", {})
    if args.dataset_type is None:
        args.dataset_type = ds_cfg.get("type", "nerf")
    if args.path is None:
        args.path = ds_cfg.get("path") or None
    if args.path is None and args.dataset_type != "synthetic":
        ap.error("--path required (checkpoint stores no dataset path)")

    ds_kw = {}
    if args.dataset_type == "synthetic":
        # Rebuild the exact procedural scene the checkpoint trained on
        # (multi-sensor rig incl. fisheye/rolling-shutter/mask views).
        r = ds_cfg.get("synthetic_resolution", 64)
        ds_kw = dict(num_views=ds_cfg.get("synthetic_views", 12),
                     resolution=(r, r),
                     num_gt_gaussians=ds_cfg.get("synthetic_gt", 96),
                     multi_sensor=ds_cfg.get("synthetic_multi_sensor",
                                             False))
    dataset = datasets.make(args.dataset_type, args.path, split=args.split,
                            **ds_kw)
    renderer = Renderer.from_checkpoint(args.checkpoint, dataset)
    summary = renderer.render_all(out_dir=args.out_dir,
                                  save_gt=args.save_gt,
                                  compute_lpips=args.compute_extra_metrics)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
