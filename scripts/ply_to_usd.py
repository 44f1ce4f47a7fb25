#!/usr/bin/env python
"""Convert a 3DGS PLY into a NuRec USDZ (reference:
threedgrut/export/scripts/ply_to_usd.py).

Usage: python scripts/ply_to_usd.py model.ply --output_file model.usdz
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ply_file")
    ap.add_argument("--output_file", default=None)
    args = ap.parse_args(argv)

    from threedgrut_tpu.export.ply import import_ply
    from threedgrut_tpu.export.usdz import export_usdz

    out = args.output_file or args.ply_file.rsplit(".", 1)[0] + ".usdz"
    params = import_ply(args.ply_file)
    export_usdz(params, out, apply_normalizing_transform=False)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
