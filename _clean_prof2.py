import time
import numpy as np
import jax, jax.numpy as jnp
from threedgrut_tpu.ops import projection as proj_ops, tiles as tile_ops
from threedgrut_tpu.ops.pallas import tile_raster
from threedgrut_tpu.render import gut
from threedgrut_tpu.cameras import PinholeCamera, pose_from_matrix
from threedgrut_tpu.datasets.dataset_synthetic import look_at

n, res, cap = 1_000_000, (800, 800), 1 << 22
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.normal(0, 1.0, size=(n,3)).astype(np.float32))
q = jnp.asarray(rng.normal(size=(n,4)).astype(np.float32)); q/=jnp.linalg.norm(q,axis=-1,keepdims=True)
s = jnp.asarray(np.exp(rng.uniform(np.log(0.004), np.log(0.02), size=(n,3))).astype(np.float32))
opa = jnp.full((n,), 0.5, jnp.float32)
feats = np.zeros((n,16,3), np.float32); feats[:,0]=rng.uniform(-1,1,(n,3))
feats = jnp.asarray(feats)
cam = PinholeCamera(jnp.asarray([720.,720.]), jnp.asarray([400.,400.]),
                    jnp.zeros(6), jnp.zeros(2), jnp.zeros(4))
T = jnp.asarray(look_at(np.array([0.,-4.,1.],np.float32), np.zeros(3,np.float32), np.array([0.,0.,1.],np.float32)))

def timeit(f, *a, iters=10):
    # force real completion with a tiny host readback each round
    r = f(*a); _ = float(jnp.sum(jax.tree.leaves(r)[0][:1].astype(jnp.float32)))
    t0=time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    _ = float(jnp.sum(jax.tree.leaves(r)[0][:1].astype(jnp.float32)))
    # NOTE: per-iter dispatches may overlap; to serialize, readback each iter:
    t1 = time.perf_counter()
    t_pipelined = (t1-t0)/iters*1000
    t0=time.perf_counter()
    for _ in range(iters):
        r = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(r)[0][:1].astype(jnp.float32)))
    t_sync = (time.perf_counter()-t0)/iters*1000
    return t_pipelined, t_sync

projf = jax.jit(lambda pos,q,s,opa,cam,T: proj_ops.project(pos,q,s,opa,cam,pose_from_matrix(T),0,res))
print("project ms:", timeit(projf, pos,q,s,opa,cam,T), flush=True)
proj = projf(pos,q,s,opa,cam,T)
binf = jax.jit(lambda proj: tile_ops.bin_particles(proj, (50,50), cap))
print("bin ms:", timeit(binf, proj), flush=True)
binning = binf(proj)
prepf = jax.jit(lambda pos,q,s,opa,feats,cam,T: gut.prepare(pos,q,s,opa,feats,cam,pose_from_matrix(T),res,cap,sh_degree=3)[2])
print("prepare ms:", timeit(prepf, pos,q,s,opa,feats,cam,T), flush=True)
data_sorted = prepf(pos,q,s,opa,feats,cam,T)
rays = jax.jit(lambda cam,T: gut.packed_world_rays(cam, pose_from_matrix(T), (50,50), T))(cam,T)
fwf = jax.jit(lambda d,st,en,r: tile_raster.tile_composite(d,st,en,r,2,1e-4))
print("pallas fwd ms:", timeit(fwf, data_sorted, binning.tile_starts, binning.tile_ends, rays), flush=True)
def loss(d,st,en,r):
    return jnp.sum(tile_raster.tile_composite(d,st,en,r,2,1e-4)[:, :4])
fbf = jax.jit(jax.grad(loss))
print("pallas fwd+bwd ms:", timeit(fbf, data_sorted, binning.tile_starts, binning.tile_ends, rays), flush=True)
def full_loss(pos,q,s,opa,feats,cam,T):
    out, _ = gut.render(pos,q,s,opa,feats,cam,pose_from_matrix(T),res,cap,sh_degree=3,T_to_world=T)
    return jnp.mean(out.rgb) + jnp.mean(out.opacity)
fgf = jax.jit(jax.grad(full_loss, argnums=(0,1,2,3,4)))
print("full fwd+bwd ms:", timeit(fgf, pos,q,s,opa,feats,cam,T), flush=True)

# Breakdown of the backward chain.
from threedgrut_tpu.ops import tiles as tile_ops2
binning2 = jax.jit(lambda proj: tile_ops2.bin_particles(proj, (50,50), cap))(proj)
from threedgrut_tpu.ops.sorted_gather import sorted_gather
packedf = jax.jit(lambda pos,q,s,opa,feats: gut.pack_particles(pos, q, jnp.ones_like(s)*s, opa, feats[:, 0]))
def sg_loss(packed):
    return jnp.sum(sorted_gather(packed, binning2.sorted_particle_idx, binning2.perm, binning2.particle_ends, binning2.particle_counts))
packed0 = jnp.ones((n, 16))
sgf = jax.jit(jax.grad(sg_loss))
print("sorted_gather fwd+bwd ms:", timeit(sgf, packed0), flush=True)
def pack_loss(pos,q,s,opa,feats):
    pk = gut.pack_particles(pos, q, s, opa, feats[:, 0])
    return jnp.sum(pk * 0.5)
pkf = jax.jit(jax.grad(pack_loss, argnums=(0,1,2,3)))
print("pack fwd+bwd ms:", timeit(pkf, pos, q, s, opa, feats), flush=True)
def proj_loss(pos,q,s,opa):
    pr = proj_ops.project(pos,q,s,opa,cam,pose_from_matrix(T),0,res)
    return jnp.sum(pr.center) + jnp.sum(pr.conic) + jnp.sum(pr.depth)
prf = jax.jit(jax.grad(proj_loss, argnums=(0,1,2,3)))
print("project fwd+bwd ms:", timeit(prf, pos, q, s, opa), flush=True)
