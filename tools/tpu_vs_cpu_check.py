"""Compare the Pallas fast path ON REAL TPU against CPU-computed oracle."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np
import jax, jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from tests.test_gut_reference import random_scene
from tests.test_cameras import IDENTITY_POSE, make_pinhole
from threedgrut_tpu.render import gut

RES = (64, 64)
CAM = make_pinhole(f=120.0, cx=32.0, cy=32.0)
scene = random_scene(n=256, seed=5)
pos, quat, scale, opa, feats = [np.asarray(x) for x in scene]

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
print("devices:", cpu, tpu)

from threedgrut_tpu.ops.pallas import tile_raster

def run(device):
    tile_raster._should_interpret = (lambda: device.platform != "tpu")
    args = [jax.device_put(jnp.asarray(x), device)
            for x in (pos, quat, scale, opa, feats)]
    cam = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), device), CAM)
    pose = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), device),
                        IDENTITY_POSE)
    with jax.default_device(device):
        out, ovf = gut.render(*args, cam, pose, RES, 2048)
        # grads too
        def loss(pos, opa):
            o, _ = gut.render(pos, args[1], args[2], opa, args[4], cam, pose,
                              RES, 2048)
            return jnp.mean(o.rgb) + jnp.mean(o.opacity)
        g = jax.grad(loss, argnums=(0, 1))(args[0], args[3])
    return (np.asarray(out.rgb), np.asarray(out.opacity),
            np.asarray(out.transmittance), np.asarray(g[0]), np.asarray(g[1]))

r_tpu = run(tpu)
r_cpu = run(cpu)
names = ["rgb", "opacity", "transmittance", "d_pos", "d_opa"]
for n, a, b in zip(names, r_tpu, r_cpu):
    diff = np.abs(a - b).max()
    scale_ = np.abs(b).max() + 1e-12
    print(f"{n}: max abs diff {diff:.3e} (rel {diff/scale_:.3e})")
    assert diff < 5e-4 * scale_ + 1e-5, n
print("TPU matches CPU oracle-path: OK")


# --- bf16 gradient-reorder leg (render.low_precision_grads=True) ---------
# The train step's default rounds the per-slot cotangent reorder to bf16
# (sorted_gather.py _pack_bf16_pairs); per-particle sums stay f32. Expected
# relative error vs the f32 path is bounded by the bf16 unit roundoff on
# individual slot cotangents, ~2^-9 = 2e-3; images are UNAFFECTED (forward
# is identical). Tolerance here: 4e-3 relative on gradients, exact on rgb.
def run_lowprec(device):
    tile_raster._should_interpret = (lambda: device.platform != "tpu")
    args = [jax.device_put(jnp.asarray(x), device)
            for x in (pos, quat, scale, opa, feats)]
    cam = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), device), CAM)
    pose = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), device),
                        IDENTITY_POSE)
    with jax.default_device(device):
        out, _ = gut.render(*args, cam, pose, RES, 2048,
                            low_precision_grads=True)
        def loss(pos, opa):
            o, _ = gut.render(pos, args[1], args[2], opa, args[4], cam, pose,
                              RES, 2048, low_precision_grads=True)
            return jnp.mean(o.rgb) + jnp.mean(o.opacity)
        g = jax.grad(loss, argnums=(0, 1))(args[0], args[3])
    return np.asarray(out.rgb), np.asarray(g[0]), np.asarray(g[1])

rgb16, gpos16, gopa16 = run_lowprec(tpu)
assert np.array_equal(rgb16, r_tpu[0]), "bf16 grads must not change forward"
for n, a, b in (("d_pos", gpos16, r_tpu[3]), ("d_opa", gopa16, r_tpu[4])):
    diff = np.abs(a - b).max()
    scale_ = np.abs(b).max() + 1e-12
    print(f"bf16 {n}: max abs diff {diff:.3e} (rel {diff/scale_:.3e})")
    assert diff < 4e-3 * scale_, f"bf16 {n}"
print("bf16 gradient-reorder leg within documented tolerance: OK")


# --- fused walked-compaction leg (render.walk_compact_fraction) -----------
# The train step's default routes the backward through the fused op
# (ops/fused_raster.py): walked-window compaction + the by-ids Pallas
# segment sum on TPU. On CPU the same call takes the XLA fallback path, so
# this leg cross-checks the by-ids kernel numerics on the real chip.
# Exact-f32 tolerance: the compacted sum drops only exactly-zero rows.
def run_fused(device):
    tile_raster._should_interpret = (lambda: device.platform != "tpu")
    args = [jax.device_put(jnp.asarray(x), device)
            for x in (pos, quat, scale, opa, feats)]
    cam = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), device), CAM)
    pose = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), device),
                        IDENTITY_POSE)
    with jax.default_device(device):
        out, _ = gut.render(*args, cam, pose, RES, 2048, walk_capacity=1024)
        def loss(pos, opa):
            o, _ = gut.render(pos, args[1], args[2], opa, args[4], cam, pose,
                              RES, 2048, walk_capacity=1024)
            return jnp.mean(o.rgb) + jnp.mean(o.opacity)
        g = jax.grad(loss, argnums=(0, 1))(args[0], args[3])
    return np.asarray(out.rgb), np.asarray(g[0]), np.asarray(g[1])

rgbf, gposf, gopaf = run_fused(tpu)
assert np.array_equal(rgbf, r_tpu[0]), "fused path must not change forward"
for n, a, b in (("d_pos", gposf, r_tpu[3]), ("d_opa", gopaf, r_tpu[4])):
    diff = np.abs(a - b).max()
    scale_ = np.abs(b).max() + 1e-12
    print(f"fused {n}: max abs diff {diff:.3e} (rel {diff/scale_:.3e})")
    assert diff < 5e-4 * scale_ + 1e-5, f"fused {n}"
print("fused walked-compaction leg matches the plain path: OK")


# --- sorted (k-buffer) leg -------------------------------------------------
# The per-ray odd-even re-sort (sorted_passes=16, with the r5 adaptive
# convergence gate) on real TPU vs the CPU oracle path. The gate is exact
# (two quiet passes == sorted), so tolerance is the same as the plain leg.
def run_sorted(device):
    tile_raster._should_interpret = (lambda: device.platform != "tpu")
    args = [jax.device_put(jnp.asarray(x), device)
            for x in (pos, quat, scale, opa, feats)]
    cam = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), device), CAM)
    pose = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), device),
                        IDENTITY_POSE)
    with jax.default_device(device):
        out, _ = gut.render(*args, cam, pose, RES, 2048, sorted_passes=16)
        def loss(pos, opa):
            o, _ = gut.render(pos, args[1], args[2], opa, args[4], cam, pose,
                              RES, 2048, sorted_passes=16)
            return jnp.mean(o.rgb) + jnp.mean(o.opacity)
        g = jax.grad(loss, argnums=(0, 1))(args[0], args[3])
    return np.asarray(out.rgb), np.asarray(g[0]), np.asarray(g[1])

rs_tpu = run_sorted(tpu)
rs_cpu = run_sorted(cpu)
for n, a, b in zip(["rgb", "d_pos", "d_opa"], rs_tpu, rs_cpu):
    diff = np.abs(a - b).max()
    scale_ = np.abs(b).max() + 1e-12
    print(f"sorted {n}: max abs diff {diff:.3e} (rel {diff/scale_:.3e})")
    assert diff < 5e-4 * scale_ + 1e-5, f"sorted {n}"
print("sorted (adaptive k-buffer) leg matches CPU oracle: OK")
