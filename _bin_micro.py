import time
import numpy as np
import jax, jax.numpy as jnp

n, cap = 1_000_000, 1 << 22
rng = np.random.default_rng(0)
counts_np = rng.integers(0, 6, n).astype(np.int32)
counts = jnp.asarray(counts_np)
vals = jnp.asarray(rng.uniform(size=(n,)).astype(np.float32))
vals2 = jnp.asarray(rng.integers(0,50,(n,2)).astype(np.int32))
idx4m = jnp.asarray(rng.integers(0, n, cap).astype(np.int32))
tile4m = jnp.asarray(rng.integers(0, 2500, cap).astype(np.int32))
depth4m = jnp.asarray(rng.uniform(0.1, 10, cap).astype(np.float32))

def timeit(f, *a, iters=5):
    r = f(*a); _ = np.asarray(jax.tree.leaves(r)[0][:1])
    t0=time.perf_counter()
    for _i in range(iters):
        r = f(*a)
        _ = np.asarray(jax.tree.leaves(r)[0][:1])
    return (time.perf_counter()-t0)/iters*1000

print("cumsum 1M:", timeit(jax.jit(lambda c: jnp.cumsum(c)), counts))
ends = jnp.cumsum(counts)
print("searchsorted scan:", timeit(jax.jit(lambda e: jnp.searchsorted(e, jnp.arange(cap,dtype=jnp.int32), side='right')), ends))
print("searchsorted sortm:", timeit(jax.jit(lambda e: jnp.searchsorted(e, jnp.arange(cap,dtype=jnp.int32), side='right', method='sort')), ends))
def scatter_cummax(c):
    e = jnp.cumsum(c); st = e - c
    m = jnp.zeros((cap,), jnp.int32).at[jnp.where(c>0, st, cap)].max(jnp.arange(n,dtype=jnp.int32), mode="drop")
    return jax.lax.cummax(m)
print("scatter+cummax:", timeit(jax.jit(scatter_cummax), counts))
print("gather 1M->4M f32:", timeit(jax.jit(lambda v,i: v[i]), vals, idx4m))
print("gather 1M->4M [2]i32:", timeit(jax.jit(lambda v,i: v[i]), vals2, idx4m))
print("sort 2key+1val 4M:", timeit(jax.jit(lambda t,d,p: jax.lax.sort((t,d,p), num_keys=2)), tile4m, depth4m, idx4m))
def fused_key(t,d,p):
    db = jax.lax.bitcast_convert_type(d, jnp.int32)
    key = (t.astype(jnp.int64) << 32) | db.astype(jnp.int64)
    return jax.lax.sort((key, p), num_keys=1)
try:
    print("sort i64 fused+1val:", timeit(jax.jit(fused_key), tile4m, depth4m, idx4m))
except Exception as ex: print("i64 sort fail", ex)
def fused32(t,d,p):
    db = jax.lax.bitcast_convert_type(d, jnp.int32) >> 12
    key = (t << 19) | db
    return jax.lax.sort((key, p), num_keys=1)
print("sort u32 fused+1val:", timeit(jax.jit(fused32), tile4m, depth4m, idx4m))
print("sort 1key f32 +1val:", timeit(jax.jit(lambda d,p: jax.lax.sort((d,p), num_keys=1)), depth4m, idx4m))
print("gather 1M->4M [16]f32:", timeit(jax.jit(lambda v,i: v[i]), jnp.asarray(rng.uniform(size=(n,16)).astype(np.float32)), idx4m))
