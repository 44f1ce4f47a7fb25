"""stream_compact kernel (interpret mode) vs a direct numpy oracle."""
import jax.numpy as jnp
import numpy as np

from threedgrut_tpu.ops.pallas.stream_compact import (
    _FILL_DEPTH,
    compact_streams,
)

CHUNK = 128
S = 16


def make_case(seed=0, wins_per_seg=(2, 0, 5, 1), density=0.3, extra_tail=2):
    rng = np.random.default_rng(seed)
    nws = sum(wins_per_seg)
    n_seg = len(wins_per_seg)
    n_slots = nws * CHUNK
    gid = rng.integers(0, 1 << 20, n_slots).astype(np.float32)
    bits = np.zeros(n_slots, np.int64)
    for s in range(S):
        bits |= (rng.random(n_slots) < density).astype(np.int64) << s
    depths = rng.uniform(1.0, 9.0, (S, n_slots)).astype(np.float32)

    r = 24
    vals = np.zeros((nws, r, CHUNK), np.float32)
    vals[:, 0] = gid.reshape(nws, CHUNK)
    vals[:, 1] = bits.astype(np.float32).reshape(nws, CHUNK)
    for s in range(S):
        vals[:, 2 + s] = depths[s].reshape(nws, CHUNK)

    seg_ws = np.cumsum([0] + list(wins_per_seg))[:-1].astype(np.int32)
    seg_we = np.cumsum(wins_per_seg).astype(np.int32)

    # Per-(segment, stream) counts -> padded bases, oracle output.
    counts = np.zeros((n_seg, S), np.int64)
    for sp in range(n_seg):
        lo, hi = seg_ws[sp] * CHUNK, seg_we[sp] * CHUNK
        for s in range(S):
            counts[sp, s] = int(((bits[lo:hi] >> s) & 1).sum())
    padded = -(-counts // CHUNK) * CHUNK
    offs = np.concatenate([[0], np.cumsum(padded.reshape(-1))[:-1]])
    base_w = (offs // CHUNK).astype(np.int32)
    capF = int(np.cumsum(padded.reshape(-1))[-1]) + extra_tail * CHUNK

    ref = np.zeros((2, capF), np.float32)
    ref[1] = _FILL_DEPTH
    for sp in range(n_seg):
        lo, hi = seg_ws[sp] * CHUNK, seg_we[sp] * CHUNK
        for s in range(S):
            o = sp * S + s
            m = ((bits[lo:hi] >> s) & 1).astype(bool)
            g = gid[lo:hi][m]
            d = depths[s, lo:hi][m]
            ref[0, offs[o]:offs[o] + len(g)] = g
            ref[1, offs[o]:offs[o] + len(g)] = d
    return (jnp.asarray(vals), jnp.asarray(seg_ws), jnp.asarray(seg_we),
            jnp.asarray(base_w), capF, ref)


def test_matches_oracle():
    vals, seg_ws, seg_we, base_w, capF, ref = make_case()
    out = np.asarray(compact_streams(vals, seg_ws, seg_we, base_w, capF, S))
    np.testing.assert_array_equal(out, ref)


def test_matches_oracle_dense_and_sparse():
    # Dense masks force many flushes per stream; sparse ones exercise the
    # count-zero predication and residual-only streams.
    for seed, density in ((1, 0.9), (2, 0.02)):
        vals, seg_ws, seg_we, base_w, capF, ref = make_case(
            seed=seed, wins_per_seg=(4, 1, 3), density=density)
        out = np.asarray(
            compact_streams(vals, seg_ws, seg_we, base_w, capF, S))
        np.testing.assert_array_equal(out, ref)


def test_overflow_truncates_flagged_ranges():
    # capF smaller than the true padded total: streams whose ranges fall
    # past capF are skipped (their output windows do not exist); the donor
    # pattern fills nothing beyond. The caller reports overflow.
    vals, seg_ws, seg_we, base_w, capF, ref = make_case(
        seed=3, wins_per_seg=(3, 3, 2), density=0.5, extra_tail=0)
    short = capF - 2 * CHUNK
    out = np.asarray(
        compact_streams(vals, seg_ws, seg_we, base_w, short, S))
    np.testing.assert_array_equal(out, ref[:, :short])
