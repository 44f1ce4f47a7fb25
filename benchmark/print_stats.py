#!/usr/bin/env python
"""Aggregate per-scene eval summaries (reference benchmark/print_stats.sh)."""
import glob
import json
import os
import sys


def main(root):
    rows = []
    for log in sorted(glob.glob(os.path.join(root, "..", "*_eval.log"))):
        scene = os.path.basename(log).replace("_eval.log", "")
        try:
            text = open(log).read()
            start = text.index("{")
            summary = json.loads(text[start:text.rindex("}") + 1])
            rows.append((scene, summary))
        except (ValueError, json.JSONDecodeError):
            continue
    if not rows:
        print("no eval logs found under", root)
        return
    keys = ["psnr", "ssim", "lpips", "mean_render_s"]
    print(f"{'scene':<12}" + "".join(f"{k:>14}" for k in keys))
    means = {k: [] for k in keys}
    for scene, s in rows:
        print(f"{scene:<12}" + "".join(
            f"{s.get(k, float('nan')):>14.4f}" for k in keys))
        for k in keys:
            if k in s:
                means[k].append(s[k])
    print(f"{'MEAN':<12}" + "".join(
        f"{(sum(v)/len(v) if v else float('nan')):>14.4f}"
        for v in (means[k] for k in keys)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs")
