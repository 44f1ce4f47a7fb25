"""A/B the bf16 gradient-reorder default (render.low_precision_grads).

VERDICT round-2 item 3: the headline bench runs with low_precision_grads=True
(bf16-rounded per-slot cotangents in the unsort; f32 per-particle sums). This
quantifies the training impact at scale: two identical 800x800 runs on the
procedural scale-proof scene, f32 vs bf16 gradients, same seed/schedule.
Reports final train loss + val PSNR/SSIM per leg.

    python tools/ab_lowprec.py [steps]     # default 2000

Writes runs/ab_lowprec.json and prints one JSON line per leg.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def run_leg(lowprec: bool, steps: int, seed: int = 0):
    from tools.tpu_train_scale import build_trainer
    tr = build_trainer()
    tr.cfg.render.low_precision_grads = lowprec
    if seed:
        # Seed-noise control leg: same precision, different shuffling/keys —
        # calibrates how much of the f32-vs-bf16 delta is run-to-run noise.
        import jax
        tr.cfg.train.seed = seed
        tr.key = jax.random.PRNGKey(seed)
    # Same schedule/seed for both legs; densification on so gradient noise
    # can compound through clone/split decisions.
    t0 = time.time()
    tr.run(iterations=steps, log_every=500, out_dir=None)
    wall = time.time() - t0
    val = tr.validate()
    leg = dict(low_precision_grads=lowprec, steps=steps,
               final_loss=float(tr.history[-1]["loss"]) if tr.history else None,
               train_psnr=float(tr.history[-1]["psnr"]) if tr.history else None,
               val_psnr=val["psnr"], val_ssim=val["ssim"],
               particles=int(tr.params.num_active()), wall_s=round(wall, 1))
    print(json.dumps(leg), flush=True)
    return leg


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    if len(sys.argv) > 2 and sys.argv[2] == "noise":
        # Control: f32 at a different seed — prints one leg for comparison
        # against the seed-0 f32 leg in runs/ab_lowprec.json.
        leg = run_leg(False, steps, seed=1)
        leg["seed"] = 1
        with open("/root/repo/runs/ab_lowprec_noise.json", "w") as f:
            json.dump(leg, f, indent=2)
            f.write("\n")
        return
    legs = [run_leg(False, steps), run_leg(True, steps)]
    delta = legs[0]["val_psnr"] - legs[1]["val_psnr"]
    out = dict(legs=legs, val_psnr_delta_f32_minus_bf16=round(delta, 4))
    os.makedirs("/root/repo/runs", exist_ok=True)
    with open("/root/repo/runs/ab_lowprec.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
