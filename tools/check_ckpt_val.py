"""Re-validate a scale_proof checkpoint: renders the val split and prints
per-view PSNR + overflow — diagnoses run1's anomalous end-of-run val
(8.8 dB vs 39.9 mid-run at the same step)."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main(ckpt):
    from tools.tpu_train_scale import ScaleDataset
    from threedgrut_tpu.trainer import Trainer

    val = ScaleDataset("val")
    tr = Trainer.load_checkpoint(ckpt, dataset=val)
    tr.val_dataset = val
    print("step", tr.global_step, "n_active", int(tr.params.num_active()),
          "isect_cap", tr.isect_capacity, flush=True)
    psnrs = []
    for i in range(len(val)):
        aux = tr.eval_view(val[i])
        p = float(aux["psnr"])
        psnrs.append(p)
        print(f"view {i}: psnr {p:.2f} overflow {bool(aux['overflow'])}",
              flush=True)
    print("mean psnr", np.mean(psnrs))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "/root/repo/runs/scale_proof/ckpt_12000.npz")
