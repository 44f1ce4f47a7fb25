import time
import numpy as np
import jax, jax.numpy as jnp

n, cap = 1_000_000, 1 << 22
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, n, cap).astype(np.int32))
g = jnp.asarray(rng.uniform(size=(cap, 16)).astype(np.float32))

def timeit(f, *a, iters=5):
    r = f(*a); _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    t0=time.perf_counter()
    for _i in range(iters):
        r = f(*a)
        _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    return (time.perf_counter()-t0)/iters*1000

print("scatter-add [4M,16]->[1M,16]:", timeit(jax.jit(lambda i, g: jnp.zeros((n,16)).at[i].add(g)), idx, g))
print("segment_sum:", timeit(jax.jit(lambda i, g: jax.ops.segment_sum(g, i, num_segments=n)), idx, g))
# sorted indices (as in our case — sorted by (tile,depth) but idx is grouped-ish? no, arbitrary) — try sorted
idx_sorted = jnp.sort(idx)
print("scatter-add sorted idx:", timeit(jax.jit(lambda i, g: jnp.zeros((n,16)).at[i].add(g)), idx_sorted, g))
