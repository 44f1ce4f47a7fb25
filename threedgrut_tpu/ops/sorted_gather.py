"""Gather packed particle rows into sorted-slot order, with a scatter-free
backward.

Forward: data_sorted[j] = packed[sorted_idx[j]] — a plain gather. Its
autodiff transpose is a scatter-add over up-to-millions of duplicate
indices, which XLA serializes on TPU (~457 ms at 4M x 16 measured vs ~0.2 ms
of useful bandwidth). This op replaces that transpose with a deterministic
segment-difference reduction that exploits the binning structure:

  * backward: STABLY sort the cotangent rows by `sorted_idx` (the particle
    id each slot gathered from — already carried by the binning sort, so no
    extra permutation operand is needed there). Every expansion slot appears
    exactly once in sorted order, so particle p contributes exactly
    min(ends[p], cap) - min(ends[p] - counts[p], cap) rows and the grouped
    rows form the SAME contiguous segments [ends[p-1], ends[p]) (clamped to
    cap) as expansion order — including under overflow truncation. Tail
    slots (cap > true total) carry id N from the binning and sort past every
    real segment (ops/tiles.py).
  * reduce each contiguous segment in one Pallas pass (segment_sum.py), or
    cumsum + boundary-row differences on the XLA fallback path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _blocked_cumsum(x, block: int = 256):
    """Two-level cumsum along axis 0 of [M, F]. XLA expands a flat cumsum
    into log2(M) ~ 22 shifted-add passes over the full array at M = 3.4M;
    splitting into [M/block, block, F] intra-block scans (log2(block) = 8
    passes) plus a tiny carry scan cuts HBM traffic ~2.7x."""
    m, f = x.shape
    if m % block:
        return jnp.cumsum(x, axis=0)
    xb = x.reshape(m // block, block, f)
    intra = jnp.cumsum(xb, axis=1)
    carry = jnp.cumsum(intra[:, -1], axis=0)
    carry = jnp.concatenate([jnp.zeros_like(carry[:1]), carry[:-1]], axis=0)
    return (intra + carry[:, None]).reshape(m, f)


def _pack_bf16_pairs(g):
    """[cap, F] f32 -> [cap, F//2] uint32: adjacent channels rounded to bf16
    and bit-packed two-per-word. Halves the payload operand count (and HBM
    traffic) of the unsort sort below."""
    u16 = jax.lax.bitcast_convert_type(g.astype(jnp.bfloat16), jnp.uint16)
    hi = u16[:, 0::2].astype(jnp.uint32) << 16
    lo = u16[:, 1::2].astype(jnp.uint32)
    return hi | lo


def _unpack_bf16_pairs(cols):
    """Inverse of _pack_bf16_pairs on a list of [cap] uint32 columns; returns
    the 2x-as-many [cap] f32 channel columns."""
    out = []
    for w in cols:
        h = jax.lax.bitcast_convert_type(
            (w >> 16).astype(jnp.uint16), jnp.bfloat16)
        l = jax.lax.bitcast_convert_type(
            w.astype(jnp.uint16), jnp.bfloat16)
        out.append(h.astype(jnp.float32))
        out.append(l.astype(jnp.float32))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def sorted_gather(packed, sorted_idx, particle_ends, particle_counts,
                  grad_precision: str = "f32"):
    """packed[sorted_idx] with a scatter-free backward.

    sorted_idx must carry particle id N (= packed.shape[0]) on tail slots
    beyond the true intersection total (ops/tiles.py does) — the backward
    groups cotangents by a stable sort on these ids, and tail rows must sort
    past every real segment. The forward gather clamps N to the last row
    (XLA semantics); those rows feed windows past every tile range and are
    never composited.

    grad_precision: "f32" keeps the backward's slot-gradient reorder exact;
    "bf16" rounds per-slot cotangents to bf16 and packs channel pairs into
    single sort payload words (half the unsort bandwidth, ~2x faster on the
    dominant stage; per-particle sums still accumulate in f32 — relative
    gradient error ~2^-9, validated for training in tests/test_trainer.py).
    """
    return packed[sorted_idx]


def _fwd(packed, sorted_idx, particle_ends, particle_counts,
         grad_precision="f32"):
    out = packed[sorted_idx]
    return out, (packed.shape[0], sorted_idx, particle_ends, particle_counts)


def _bwd(grad_precision, res, g_sorted):
    n, sorted_idx, ends, counts = res
    del counts
    cap = g_sorted.shape[0]
    # Group cotangents by particle with a STABLE sort on the particle id
    # (segments land at [ends[p-1], ends[p]), module docstring). A 17-operand
    # lax.sort moves payload at ~1.3 ms/channel on v5e (~36 ms total at 3.4M
    # rows) where the argsort + 16-channel gather it replaces cost ~63 ms —
    # TPU gathers are row-dispatch-bound, sorts are bandwidth-bound.
    nch = g_sorted.shape[1]
    if grad_precision == "bf16" and nch % 2 == 0:
        pk = _pack_bf16_pairs(g_sorted)
        ops = (sorted_idx,) + tuple(pk[:, i] for i in range(nch // 2))
        sorted_pk = jax.lax.sort(ops, num_keys=1)
        sorted_ops = (sorted_pk[0],) + tuple(
            _unpack_bf16_pairs(sorted_pk[1:]))
    else:
        ops = (sorted_idx,) + tuple(g_sorted[:, i] for i in range(nch))
        sorted_ops = jax.lax.sort(ops, num_keys=1)
    # Contiguous segments ([ends[p-1], ends[p]) covers [0, total)) reduce in
    # one Pallas pass (ops/pallas/segment_sum.py) — replaces the former
    # stack + [cap, 16] cumsum + 1M-row boundary gather (~42 -> ~11 ms at
    # cap=3.4M; the gather's per-row dispatch dominated).
    import os
    from threedgrut_tpu.ops.pallas import tile_raster
    if (cap % 256 == 0 and not tile_raster._should_interpret()
            and os.environ.get("THREEDGRUT_SEGSUM", "pallas") != "xla"):
        from threedgrut_tpu.ops.pallas.segment_sum import segment_sum_rows
        g_cm = jnp.stack(sorted_ops[1:], axis=0)          # [16, cap]
        ne = ends.shape[0]                # may exceed n (capacity padding)
        ne_pad = -(-ne // 256) * 256
        e_pad = ends if ne_pad == ne else jnp.concatenate(
            [ends, jnp.broadcast_to(ends[-1:], (ne_pad - ne,))])
        # [F, N] channel-major out; the .T is a free bitcast (layout note in
        # segment_sum_rows' docstring). On the bf16 leg the unpacked values
        # are exactly bf16-representable, so the reduction's DEFAULT-
        # precision MXU pass is bitwise identical to HIGHEST at 1/3 the
        # passes (segment_sum_rows docstring).
        return (segment_sum_rows(
            g_cm, e_pad,
            bf16_values=(grad_precision == "bf16" and nch % 2 == 0))
            [:, :n].T, None, None, None)
    g_exp = jnp.stack(sorted_ops[1:], axis=-1)
    cum = _blocked_cumsum(g_exp)
    e = jnp.minimum(ends, cap)
    top = jnp.where((e > 0)[:, None], cum[jnp.clip(e - 1, 0, cap - 1)], 0.0)
    prev = jnp.concatenate([jnp.zeros_like(top[:1]), top[:-1]], axis=0)
    return top - prev, None, None, None


sorted_gather.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gather_rows(table, idx):
    """table[idx] with a scatter-free backward for ARBITRARY (repeating)
    indices: sort the cotangent rows by index, then contiguous segment sums
    (cumsum + one boundary gather). Used by the 3DGRT bundle path whose
    candidate lists have no expansion structure to exploit."""
    return table[idx]


def _gr_fwd(table, idx):
    return table[idx], (table.shape[0], idx)


def _gr_bwd(res, g):
    n, idx = res
    m = idx.shape[0]
    keys, order = jax.lax.sort(
        (idx, jnp.arange(m, dtype=jnp.int32)), num_keys=1)
    g_sorted = g[order]
    # method="sort": the default binary search lowers to ~log2(m) rounds of
    # n-row gathers (~190 ms at m=3.1M, n=1M on v5e — row-dispatch bound);
    # the sort-based form is one (m+n)-row bitonic pass (~10 ms).
    ends = jnp.searchsorted(keys, jnp.arange(n, dtype=jnp.int32),
                            side="right", method="sort").astype(jnp.int32)
    # Contiguous per-index segments reduce in one Pallas pass (the same
    # segment_sum_rows as sorted_gather's backward) — replaces the
    # [m, F]-cumsum + boundary gather (~2x cheaper at the 3DGRT bench's
    # 2.1M x 64 shape).
    import os
    from threedgrut_tpu.ops.pallas import tile_raster
    if (m % 256 == 0 and g.shape[1] % 8 == 0
            and not tile_raster._should_interpret()
            and os.environ.get("THREEDGRUT_SEGSUM", "pallas") != "xla"):
        from threedgrut_tpu.ops.pallas.segment_sum import segment_sum_rows
        ne_pad = -(-n // 256) * 256
        e_pad = ends if ne_pad == n else jnp.concatenate(
            [ends, jnp.broadcast_to(ends[-1:], (ne_pad - n,))])
        return segment_sum_rows(g_sorted.T, e_pad)[:, :n].T, None
    cum = _blocked_cumsum(g_sorted)
    top = jnp.where((ends > 0)[:, None], cum[jnp.clip(ends - 1, 0, m - 1)],
                    0.0)
    prev = jnp.concatenate([jnp.zeros_like(top[:1]), top[:-1]], axis=0)
    return top - prev, None


gather_rows.defvjp(_gr_fwd, _gr_bwd)
