"""GRT flat-cull stage decomposition probe (r5). Run on TPU:
    python tools/probe_grt_cull.py
Measures L1 test / top_k / flatten / super-build / L2 test / pair
expand+sort (+ gather-width sub-probes appended during r5 diagnosis).
Numbers quoted in RESULTS.md r5 GRT section."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import numpy as np, jax, jax.numpy as jnp
from threedgrut_tpu.render import grt
from threedgrut_tpu import constants as C

n, side = 1_000_000, 512
s_cap, capS, capF, cand = 216832, 4591104, 3384832, 7680
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.normal(0, 1.0, (n, 3)).astype(np.float32))
q = rng.normal(size=(n, 4)).astype(np.float32); q /= np.linalg.norm(q, axis=-1, keepdims=True)
s = jnp.asarray(np.exp(rng.uniform(np.log(0.004), np.log(0.02), (n, 3))).astype(np.float32))
opa = jnp.full((n,), 0.5, jnp.float32)
o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (side*side, 1))
px = (np.arange(side) + 0.5) / side * 0.8 - 0.4
gx, gy = np.meshgrid(px, px, indexing="xy")
d_img = np.stack([gx, gy, np.ones_like(gx)], -1).astype(np.float32)
t = side // 16
d = d_img.reshape(t,16,t,16,3).transpose(0,2,1,3,4).reshape(-1,3)
d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
radius = grt.bounding_radius(s, opa, C.KERNEL_DEGREE_3DGRT)
valid = opa >= C.MIN_ALPHA

def timed(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]; np.asarray(leaf.reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(5): out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]; np.asarray(leaf.reshape(-1)[:1])
    print(f"{name:30s} {(time.perf_counter()-t0)/5*1000:8.2f} ms", flush=True)
    return out

bundles = jax.jit(lambda oo, dd: grt.make_bundles(oo, dd, 256))(o, d)
perm = jax.jit(grt.bundle_morton_order)(bundles)
sup = jax.jit(lambda b, p: grt.make_super_bundles(b, p, 16))(bundles, perm)

@jax.jit
def l1(p, r):
    return grt._cone_hit(p, r, valid, sup)
hit1, t_ax1 = timed("L1 cone test [64, 1M]", l1, pos, radius)

@jax.jit
def topk(h, t1):
    key1 = jnp.where(h, -t1, -jnp.inf)
    return jax.lax.top_k(key1, s_cap)[1].astype(jnp.int32)
sup_idx = timed("L1 top_k k=217k", topk, hit1, t_ax1)

@jax.jit
def flat(si, h):
    counts1 = jnp.sum(h.astype(jnp.int32), axis=1)
    return grt.flatten_candidates(si, counts1, capS)
fl = timed("flatten super lists", flat, sup_idx, hit1)

@jax.jit
def full(p, r):
    return grt.bundle_candidates_twolevel_flat(
        p, r, valid, o, d, 256, cand, super_capacity=s_cap,
        super_flat_capacity=capS, flat_capacity=capF)
timed("FULL flat cull (expand)", full, pos, radius)

# --- decompose the remaining flat cull: super build / L2 test / expand-sort
from threedgrut_tpu.ops.pallas import bundle_trace
chn = bundle_trace.CHUNK
m = 16
ns = (side*side//256)//16
nb = side*side//256

@jax.jit
def sup_build(p, r):
    hit1, t1 = grt._cone_hit(p, r, valid, sup)
    counts1 = jnp.sum(hit1.astype(jnp.int32), axis=1)
    return grt._super_lists_expand(hit1, counts1, s_cap, capS)
sb = timed("super build (expand, no topk)", sup_build, pos, radius)

@jax.jit
def l2test(p, r, flat_sup, valid_s, win_sup):
    nws = capS // chn
    pr = jnp.concatenate([p, r[:, None]], axis=-1)[flat_sup]
    p_s = pr[:, :3].reshape(nws, chn, 3)
    r_s = jnp.where(valid_s, pr[:, 3], -1e30).reshape(nws, chn)
    ob = bundles.origin[perm].reshape(ns, m, 3)[win_sup]
    db = bundles.direction[perm].reshape(ns, m, 3)[win_sup]
    base = bundles.base_radius[perm].reshape(ns, m)[win_sup]
    tan = bundles.tan_spread[perm].reshape(ns, m)[win_sup]
    coh = bundles.coherent[perm].reshape(ns, m)[win_sup]
    t_ax = (jnp.einsum("wpc,wmc->wpm", p_s, db)
            - jnp.einsum("wmc,wmc->wm", ob, db)[:, None, :])
    pp = jnp.sum(p_s * p_s, axis=-1)
    po = jnp.einsum("wpc,wmc->wpm", p_s, ob)
    oo = jnp.sum(ob * ob, axis=-1)
    d_sq = pp[..., None] - 2.0 * po + oo[:, None, :] - t_ax * t_ax
    d_ax = jnp.sqrt(jnp.maximum(d_sq, 0.0))
    limit = (r_s[..., None] + base[:, None, :]
             + jnp.maximum(t_ax, 0.0) * tan[:, None, :])
    cone_ok = (d_ax <= limit) & (t_ax >= -r_s[..., None])
    hit2 = ((cone_ok | ~coh[:, None, :])
            & valid_s.reshape(nws, chn)[..., None])
    return hit2, t_ax

flat_sup, valid_s, sup_ws, sup_we, ovf, win_sup = sb
h2 = timed("L2 test block", l2test, pos, radius, flat_sup, valid_s, win_sup)

@jax.jit
def pexp(hit2, t_ax, flat_sup, win_sup, sup_ws):
    nws = capS // chn
    cum = jnp.cumsum(jnp.sum(hit2.astype(jnp.int32), axis=1), axis=0)
    cum0 = jnp.concatenate([jnp.zeros((1, m), jnp.int32), cum])
    counts2 = cum0[sup_we] - cum0[sup_ws]
    iperm = jnp.zeros((nb,), jnp.int32).at[perm].set(jnp.arange(nb, dtype=jnp.int32))
    return grt._flat_pairs_expand_sort(
        flat_sup, hit2, t_ax, win_sup, sup_ws, cum0, counts2, cand,
        capF, nb, ns, m, iperm, jnp.bool_(False), jnp.zeros((n,), bool))
hit2, t_ax = h2
timed("pair expand+sort", pexp, hit2, t_ax, flat_sup, win_sup, sup_ws)

# --- finer split of pair expand+sort
from threedgrut_tpu.ops.sorted_gather import _blocked_cumsum
capF_ = capF
nws_ = capS // chn

@jax.jit
def part1(hit2):
    mbit = (1 << jnp.arange(m, dtype=jnp.int32))
    bits = jnp.sum(hit2.astype(jnp.int32) * mbit[None, None, :], axis=-1).reshape(capS)
    cnt = jax.lax.population_count(bits).astype(jnp.float32)
    h2f = hit2.reshape(capS, m).astype(jnp.float32)
    ecum = _blocked_cumsum(h2f) - h2f
    ends_pair = _blocked_cumsum(cnt[:, None])[:, 0]
    return bits, cnt, ecum, ends_pair
p1 = timed("  p1 bits+cumsums", part1, hit2)

@jax.jit
def part2(bits, cnt, ecum, ends_pair, flat_sup, win_sup, sup_ws, t_ax):
    base_sup = jnp.cumsum(jnp.zeros((ns,), jnp.float32))  # dummy tiny
    sup_slot = jnp.broadcast_to(win_sup[:, None], (nws_, chn)).reshape(capS).astype(jnp.float32)
    attr = jnp.concatenate([
        flat_sup.astype(jnp.float32)[:, None], sup_slot[:, None],
        bits.astype(jnp.float32)[:, None], cnt[:, None],
        (ends_pair - cnt)[:, None], t_ax.reshape(capS, m), ecum], axis=-1)
    slot_f = jnp.arange(capS, dtype=jnp.float32) + 1.0
    pos2 = jnp.where(cnt > 0, (ends_pair - cnt).astype(jnp.int32), capF_)
    fill = jnp.zeros((capF_,), jnp.float32).at[pos2].set(slot_f, mode="drop")
    owner = grt._blocked_cummax_f32(fill) - 1.0
    own_c = jnp.clip(owner, 0, capS - 1).astype(jnp.int32)
    A = attr[own_c]
    return A, owner
bits, cnt, ecum, ends_pair = p1
p2 = timed("  p2 attr+fill+gather", part2, bits, cnt, ecum, ends_pair,
           flat_sup, win_sup, sup_ws, t_ax)

@jax.jit
def part3(A, owner):
    from threedgrut_tpu.ops.pallas import expand as ex
    e_idx = jnp.arange(capF_, dtype=jnp.float32)
    local = e_idx - A[:, 4]
    pvalid = (owner >= 0) & (local < A[:, 3])
    loc_i = jnp.clip(local, 0, m - 1).astype(jnp.int32)
    member = ex.select_nth_set_bit(A[:, 2].astype(jnp.int32),
                                   jnp.zeros_like(loc_i), jnp.zeros_like(loc_i), loc_i)
    onehot = (member[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    dep = jnp.sum(A[:, 5:5+m] * onehot, axis=-1)
    rk2 = jnp.sum(A[:, 5+m:5+2*m] * onehot, axis=-1)
    o_key = member * ns + A[:, 1].astype(jnp.int32)
    gid = A[:, 0].astype(jnp.int32)
    dead = (~pvalid) | (rk2 >= cand)
    o_key = jnp.where(dead, nb, o_key)
    k1 = jnp.concatenate([o_key, jnp.full((nb*chn,), nb, jnp.int32)])
    k2 = jnp.concatenate([dep, jnp.full((nb*chn,), 3.4e38)])
    pv = jnp.concatenate([gid, jnp.zeros((nb*chn,), jnp.int32)])
    _, _, gs = jax.lax.sort((k1, k2, pv), num_keys=2)
    return gs[:capF_]
A, owner = p2
timed("  p3 decode+sort", part3, A, owner)

@jax.jit
def p2a(bits, cnt, ecum, ends_pair, flat_sup, win_sup, t_ax):
    sup_slot = jnp.broadcast_to(win_sup[:, None], (nws_, chn)).reshape(capS).astype(jnp.float32)
    attr = jnp.concatenate([
        flat_sup.astype(jnp.float32)[:, None], sup_slot[:, None],
        bits.astype(jnp.float32)[:, None], cnt[:, None],
        (ends_pair - cnt)[:, None], t_ax.reshape(capS, m), ecum], axis=-1)
    return attr
attr_ = timed("  p2a attr concat", p2a, bits, cnt, ecum, ends_pair, flat_sup, win_sup, t_ax)

@jax.jit
def p2b(cnt, ends_pair):
    slot_f = jnp.arange(capS, dtype=jnp.float32) + 1.0
    pos2 = jnp.where(cnt > 0, (ends_pair - cnt).astype(jnp.int32), capF_)
    fill = jnp.zeros((capF_,), jnp.float32).at[pos2].set(slot_f, mode="drop")
    owner = grt._blocked_cummax_f32(fill) - 1.0
    return jnp.clip(owner, 0, capS - 1).astype(jnp.int32), owner
ownc_ = timed("  p2b fill+cummax", p2b, cnt, ends_pair)

@jax.jit
def p2c(attr, own_c):
    return attr[own_c]
timed("  p2c gather 37ch", p2c, attr_, ownc_[0])

@jax.jit
def p2c16(attr, own_c):
    return attr[:, :16][own_c]
timed("  p2c gather 16ch", p2c16, attr_, ownc_[0])

@jax.jit
def p2c8(attr, own_c):
    return attr[:, :8][own_c]
timed("  p2c gather 8ch", p2c8, attr_, ownc_[0])

for W in (40, 48, 64):
    @jax.jit
    def p2cW(attr, own_c, W=W):
        a = jnp.concatenate([attr, jnp.zeros((capS, W - attr.shape[1]), jnp.float32)], axis=1)
        return a[own_c]
    timed(f"  p2c gather {W}ch padded", p2cW, attr_, ownc_[0])

@jax.jit
def p2c64b(attr, own_c):
    # pad to 64 via optimization_barrier to force materialization
    a = jnp.concatenate([attr, jnp.zeros((capS, 64 - attr.shape[1]), jnp.float32)], axis=1)
    a = jax.lax.optimization_barrier(a)
    return a[own_c]
timed("  p2c gather 64ch barrier", p2c64b, attr_, ownc_[0])
