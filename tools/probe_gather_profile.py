"""Gather cost-surface probe (r5): width x table-size at ~3.4M indices.
Found the 2-channel (8-byte row) fast path quoted in CLAUDE.md.
    python tools/probe_gather_profile.py  (TPU)"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import numpy as np, jax, jax.numpy as jnp

capS, capF, m = 4591104, 3384832, 16
rng = np.random.default_rng(0)
idx = jnp.asarray(np.sort(rng.integers(0, capS, capF)).astype(np.int32))
idx73 = jnp.asarray((np.sort(rng.integers(0, capS, capF)) * m
                     + rng.integers(0, m, capF)).astype(np.int32))

def timed(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    np.asarray(out.reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(10): out = fn(*args)
    np.asarray(out.reshape(-1)[:1])
    print(f"{name:34s} {(time.perf_counter()-t0)/10*1000:8.2f} ms", flush=True)

for W in (1, 2, 5, 8, 16):
    tab = jnp.asarray(rng.normal(size=(capS, W)).astype(np.float32))
    timed(f"gather {W}ch from [4.6M,{W}]", jax.jit(lambda t, i: t[i]), tab, idx)
tab1 = jnp.asarray(rng.normal(size=(capS * m,)).astype(np.float32))
timed("gather 1ch from [73M]", jax.jit(lambda t, i: t[i]), tab1, idx73)
tab2 = jnp.asarray(rng.normal(size=(capS * m, 2)).astype(np.float32))
timed("gather 2ch from [73M,2]", jax.jit(lambda t, i: t[i]), tab2, idx73)
# one-hot select alternative: 16ch gather + select
tab16 = jnp.asarray(rng.normal(size=(capS, m)).astype(np.float32))
mem = jnp.asarray(rng.integers(0, m, capF).astype(np.int32))
@jax.jit
def g16sel(t, i, mem):
    A = t[i]
    oh = (mem[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    return jnp.sum(A * oh, axis=-1)
timed("gather 16ch + onehot select", g16sel, tab16, idx, mem)
