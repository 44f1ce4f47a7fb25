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
    ap.add_argument("--path", default=None, help="dataset path")
    ap.add_argument("--dataset-type", default="nerf")
    ap.add_argument("--split", default="test")
    ap.add_argument("--out-dir", default="render_out")
    ap.add_argument("--save-gt", action="store_true")
    ap.add_argument("--compute-extra-metrics", action="store_true",
                    help="also compute LPIPS (host, torchmetrics)")
    args = ap.parse_args(argv)

    from threedgrut_tpu import datasets
    from threedgrut_tpu.render_eval import Renderer

    dataset = datasets.make(args.dataset_type, args.path, split=args.split)
    renderer = Renderer.from_checkpoint(args.checkpoint, dataset)
    summary = renderer.render_all(out_dir=args.out_dir,
                                  save_gt=args.save_gt,
                                  compute_lpips=args.compute_extra_metrics)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
