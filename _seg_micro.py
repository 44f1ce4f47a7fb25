import time
import numpy as np
import jax, jax.numpy as jnp

n, cap = 1_000_000, 1 << 22
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(cap).astype(np.int32))
g = jnp.asarray(rng.uniform(size=(cap, 16)).astype(np.float32))
b0 = jnp.asarray(np.sort(rng.integers(0, cap, n)).astype(np.int32))

def timeit(f, *a, iters=5):
    r = f(*a); _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    t0=time.perf_counter()
    for _i in range(iters):
        r = f(*a)
        _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    return (time.perf_counter()-t0)/iters*1000

print("perm scatter-set unique:", timeit(jax.jit(lambda p, g: jnp.zeros((cap,16)).at[p].set(g, unique_indices=True)), perm, g))
print("argsort perm:", timeit(jax.jit(lambda p: jnp.argsort(p)), perm))
def via_sort(p, g):
    inv = jnp.argsort(p)
    return g[inv]
print("argsort+gather:", timeit(jax.jit(via_sort), perm, g))
print("cumsum [4M,16] axis0:", timeit(jax.jit(lambda g: jnp.cumsum(g, axis=0)), g))
cum = jnp.cumsum(g, axis=0)
def bdiff(cum, b0):
    s = cum[b0]
    return s
print("boundary gather [1M,16]:", timeit(jax.jit(bdiff), cum, b0))
# associative_scan alternative
print("assoc_scan add [4M,16]:", timeit(jax.jit(lambda g: jax.lax.associative_scan(jnp.add, g, axis=0)), g))
