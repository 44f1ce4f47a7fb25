"""Multi-chip scaling table on the virtual CPU mesh (1/2/4/8 devices).

Device count must be fixed before JAX initializes, so each row runs in a
subprocess. Numbers are CPU-interpret-mode step times — meaningful only as
RELATIVE scaling behaviour of the sharded program (collective overhead,
replication invariants), not absolute speed; real-chip scaling uses the
same code path (parallel/trainer.py) when hardware is available.

    python tools/dp_scaling.py            # prints a table + JSON line
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import os, sys, time, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%(nd)d"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from threedgrut_tpu import optimizers
from threedgrut_tpu.config import Config
from threedgrut_tpu.datasets.dataset_synthetic import SyntheticDataset
from threedgrut_tpu.model import gaussians
from threedgrut_tpu.parallel import dp

RES = (64, 64)   # 4x4 = 16 tiles
ds = SyntheticDataset(num_views=8, resolution=RES, num_gt_gaussians=64,
                      seed=11)
pts = np.asarray(ds.scene[0]) + np.random.default_rng(1).normal(
    0, 0.05, ds.scene[0].shape).astype(np.float32)
params = gaussians.init_from_points(pts, capacity=128)
cfg = Config()
cfg.render.isect_capacity = 1 << 13
cfg.model.background_color = "black"
nd = %(nd)d
n_tile = min(nd, 4)
n_data = nd // n_tile
mesh = dp.make_mesh(nd, tile_parallel=n_tile, model_parallel=1)
step = dp.make_dp_train_step(cfg, mesh, RES, sh_degree=3)
opt = optimizers.init(params)
views = [ds[i %% len(ds)] for i in range(n_data)]
Ts = jnp.stack([jnp.asarray(v.T_to_world) for v in views])
cams = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                    *[v.camera for v in views])
gts = jnp.stack([jnp.asarray(v.rgb_gt) for v in views])
keys = jax.random.split(jax.random.PRNGKey(0), n_data)
params = dp.replicate(params, mesh)
opt = dp.replicate(opt, mesh)
p, o, m = step(params, opt, Ts, cams, gts, keys, jnp.float32(3.0))
jax.block_until_ready(p)
t0 = time.perf_counter()
ITERS = 5
for _ in range(ITERS):
    p, o, m = step(p, o, Ts, cams, gts, keys, jnp.float32(3.0))
jax.block_until_ready(p)
dt = (time.perf_counter() - t0) / ITERS
print(json.dumps({"devices": nd, "mesh": dict(mesh.shape),
                  "step_s": round(dt, 4),
                  "views_per_step": n_data,
                  "view_steps_per_s": round(n_data / dt, 3),
                  "loss": float(m["loss"])}))
"""


def main():
    rows = []
    for nd in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, "-c", CHILD % {"nd": nd}],
            capture_output=True, text=True, cwd="/root/repo")
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(f"devices={nd} FAILED:\n{out.stderr[-2000:]}")
            sys.exit(1)
        rows.append(json.loads(line[-1]))
        print(rows[-1])
    base = rows[0]["view_steps_per_s"]
    print("\ndevices  mesh(dxtxm)      step_s   views/s  scaling_eff")
    for r in rows:
        eff = r["view_steps_per_s"] / (base * r["devices"])
        m = r["mesh"]
        print(f"{r['devices']:7d}  {m['data']}x{m['tile']}x{m['model']:<10}"
              f" {r['step_s']:8.3f} {r['view_steps_per_s']:8.3f}  "
              f"{100 * eff:6.1f}%")
    with open("/root/repo/runs/dp_scaling.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    os.makedirs("/root/repo/runs", exist_ok=True)
    main()
