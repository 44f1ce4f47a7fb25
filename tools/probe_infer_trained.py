"""Compact-inference datapoint on a TRAINED checkpoint (the acceptance
run MCMC model): visible fraction + exact-vs-compact ms + PSNR.
    python tools/probe_infer_trained.py  (TPU; needs results/acceptance)"""
import os, sys, time, math
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import numpy as np, jax, jax.numpy as jnp
from playground import load_gaussians
from threedgrut_tpu.cameras import pose_from_matrix
from threedgrut_tpu.datasets.dataset_synthetic import look_at
from threedgrut_tpu.render import gut, infer
from __graft_entry__ import _example_camera

g = load_gaussians("results/acceptance/ms1/ckpt_last.npz")
P = (g.get_positions(), g.get_rotation(), g.get_scale(), g.get_density(), g.get_features())
n = P[0].shape[0]
res, cap = (800, 800), 1 << 21
cam = _example_camera(res)
T = jnp.asarray(look_at(np.array([0., -3.8, 1.2], np.float32), np.zeros(3, np.float32),
                        np.array([0., 0., 1.], np.float32)))

@jax.jit
def probe(T):
    out, ovf = gut.render(*P, cam, pose_from_matrix(T), res, cap, sh_degree=3,
                          T_to_world=T, hit_visibility=True, aux_gradients=False,
                          visibility_threshold=1.0/255.0)
    return jnp.sum(out.visibility.astype(jnp.int32)), ovf
nvis, ovf = probe(T); nvis = int(nvis)
n_c = -(-int(nvis*1.2)//4096)*4096
print(f"trained scene: {n} particles, visible@1/255 {nvis} ({100*nvis/n:.1f}%), n_c {n_c}, ovf {bool(ovf)}", flush=True)

@jax.jit
def do_refresh(T):
    out, ovf, scene = infer.refresh(*P, cam, pose_from_matrix(T), res, cap, n_c,
                                    sh_degree=3, T_to_world=T, visibility_threshold=1.0/255.0)
    return out.rgb, scene
rgb_e, scene = do_refresh(T); np.asarray(rgb_e[:1,:1])

@jax.jit
def probe_cap(scene, T):
    from threedgrut_tpu.ops import projection as proj_ops
    from threedgrut_tpu.ops import tiles as tile_ops
    proj = proj_ops.project(scene.positions, scene.quats, scene.scales,
                            scene.opacities, cam, pose_from_matrix(T), 0, res)
    return tile_ops.bin_particles(proj, (50, 50), cap).num_intersections
cap_c = -(-int(int(probe_cap(scene, T))*1.2)//256)*256
print(f"cap_c {cap_c} (full-scene isect cap {cap})", flush=True)

@jax.jit
def exact_frame(T, carry):
    out, _ = gut.render(*[p + 0.0*carry.reshape(-1)[0]*0 for p in P[:1]] + list(P[1:]), cam,
                        pose_from_matrix(T), res, cap, sh_degree=3, T_to_world=T,
                        aux_gradients=False, aux_outputs=False)
    return out.rgb
@jax.jit
def compact_frame(scene, T, carry):
    scene = scene._replace(opacities=scene.opacities + 0.0*carry.reshape(-1)[0])
    out, _ = infer.render_compact(scene, cam, pose_from_matrix(T), res, cap_c,
                                  sh_degree=3, T_to_world=T)
    return out.rgb

r = exact_frame(T, jnp.zeros((1,))); r = exact_frame(T, r); np.asarray(r[:1,:1])
t0 = time.perf_counter()
for _ in range(20): r = exact_frame(T, r)
np.asarray(r[:1,:1]); ex_ms = (time.perf_counter()-t0)/20*1000

c = compact_frame(scene, T, jnp.zeros((1,))); c = compact_frame(scene, T, c); np.asarray(c[:1,:1])
t0 = time.perf_counter()
for _ in range(20): c = compact_frame(scene, T, c)
np.asarray(c[:1,:1]); cp_ms = (time.perf_counter()-t0)/20*1000
mse = float(jnp.mean((jnp.clip(c,0,1)-jnp.clip(r,0,1))**2))
print(f"exact {ex_ms:.2f} ms, compact {cp_ms:.2f} ms, psnr_vs_exact {-10*np.log10(max(mse,1e-12)):.2f}", flush=True)
