"""sorted_gather custom backward must equal the scatter-add transpose."""
import jax
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.ops.sorted_gather import sorted_gather


def make_case(n=20, cap=64, seed=0, overflow=False):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 5, n).astype(np.int32)
    ends = np.cumsum(counts).astype(np.int32)
    total = int(ends[-1])
    if overflow:
        cap = max(8, total - 6)
    # Expansion-order particle per slot; tail slots (beyond the true total)
    # carry the sentinel id n, as the binning emits (ops/tiles.py).
    pidx = np.full(cap, n, np.int32)
    for p in range(n):
        s, e = ends[p] - counts[p], min(ends[p], cap)
        pidx[s:min(e, cap)] = p
    # Random permutation as "sorted order".
    perm = rng.permutation(cap).astype(np.int32)
    sorted_idx = pidx[perm]
    packed = rng.normal(size=(n, 16)).astype(np.float32)
    return (jnp.asarray(packed), jnp.asarray(sorted_idx), jnp.asarray(perm),
            jnp.asarray(ends), jnp.asarray(counts), cap, total)


def naive_vjp(packed, sorted_idx, g, cap, total, pidx_valid):
    # Scatter-add transpose masked to real slots.
    g = jnp.where(pidx_valid[:, None], g, 0.0)
    return jnp.zeros_like(packed).at[sorted_idx].add(g)


def check(seed, overflow):
    packed, sorted_idx, perm, ends, counts, cap, total = make_case(
        seed=seed, overflow=overflow)
    g = jnp.asarray(np.random.default_rng(seed + 100)
                    .normal(size=(cap, 16)).astype(np.float32))
    # valid slots: expansion slot < min(total, cap)
    valid = perm < min(total, cap)
    g = jnp.where(valid[:, None], g, 0.0)

    _, vjp = jax.vjp(
        lambda p: sorted_gather(p, sorted_idx, ends, counts), packed)
    g_custom = vjp(g)[0]
    g_ref = naive_vjp(packed, sorted_idx, g, cap, total, valid)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_matches_scatter():
    for seed in range(4):
        check(seed, overflow=False)


def test_matches_scatter_overflow():
    for seed in range(4):
        check(seed, overflow=True)


def test_bf16_unsort_close_to_f32():
    """grad_precision="bf16" (packed-pair payload sort) must agree with the
    exact path to bf16 rounding tolerance and keep f32 segment accumulation
    (error does not grow with segment length)."""
    for seed in range(3):
        packed, sorted_idx, perm, ends, counts, cap, total = make_case(
            seed=seed)
        g = jnp.asarray(np.random.default_rng(seed + 200)
                        .normal(size=(cap, 16)).astype(np.float32))
        valid = perm < min(total, cap)
        g = jnp.where(valid[:, None], g, 0.0)
        _, vjp32 = jax.vjp(
            lambda p: sorted_gather(p, sorted_idx, ends, counts,
                                    "f32"), packed)
        _, vjp16 = jax.vjp(
            lambda p: sorted_gather(p, sorted_idx, ends, counts,
                                    "bf16"), packed)
        g32 = np.asarray(vjp32(g)[0])
        g16 = np.asarray(vjp16(g)[0])
        # bf16 has an 8-bit mantissa: per-slot rel error <= 2^-9, and the
        # per-particle sum of <=5 slots keeps the same relative scale.
        scale = np.abs(g32).max()
        np.testing.assert_allclose(g16, g32, atol=2e-2 * scale)


def test_forward_is_gather():
    packed, sorted_idx, perm, ends, counts, cap, total = make_case(seed=7)
    out = sorted_gather(packed, sorted_idx, ends, counts)
    # Sentinel tail ids (= n) clamp to the last row under XLA gather
    # semantics; those slots sit past every tile range and are never read.
    idx = np.clip(np.asarray(sorted_idx), 0, packed.shape[0] - 1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(packed)[idx])


def test_segment_sum_rows_by_ids_interpret():
    # Direct interpret-mode contract for the by-ids Pallas variant (the
    # pallas gate routes around it on CPU in production paths): sorted ids
    # with gaps, duplicates, and >=n filler rows must reduce exactly like a
    # per-id masked sum.
    from threedgrut_tpu.ops.pallas.segment_sum import segment_sum_rows_by_ids

    rng = np.random.default_rng(7)
    n, cap, f = 512, 1024, 16
    ids = np.sort(rng.choice(
        np.r_[rng.integers(0, n, 200), np.full(56, n)], cap)).astype(np.int32)
    g = rng.normal(size=(f, cap)).astype(np.float32)
    out = segment_sum_rows_by_ids(jnp.asarray(g), jnp.asarray(ids), n)
    ref = np.zeros((f, n), np.float32)
    for p in range(n):
        m = ids == p
        if m.any():
            ref[:, p] = g[:, m].sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)
