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


def _pack_pair(a, b):
    """Two [cap] f32 columns -> one [cap] uint32: both rounded to bf16 and
    bit-packed (a in the high half). Halves the payload operand count (and
    HBM traffic) of the unsort sort below."""
    ah = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32) << 16
    bl = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return ah | bl


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


def unsort_segment_sum(ids, cols, n, ends=None, grad_precision="f32"):
    """Stable-sort cotangent columns by particle id and reduce the resulting
    contiguous per-particle segments: the scatter-free gather transpose.

    ids: [cap] int32 particle id per row — rows carrying id >= n (tail /
    padding) sort past every real segment and are discarded. cols: list of F
    [cap] f32 value columns. Returns [n, F] per-particle sums.

    ends: optional PRE-SORTED segment ends ([NE >= n] int32, the binning's
    particle_ends) — valid only when `ids` covers every expansion slot of
    every particle, so that after the stable id-sort particle p's rows land
    exactly at [ends[p-1], ends[p]). Pass None for a COMPACTED row subset
    (the walked-window backward, ops/fused_raster.py): the ends are then
    recomputed from the sorted keys with one sort-based searchsorted (the
    default binary search lowers to ~log2(cap) rounds of row gathers —
    CLAUDE.md).

    grad_precision "bf16": round values to bf16 and bit-pack channel pairs
    into single sort payload words — half the sort operand count; the
    per-particle sums still accumulate in f32 (module docstring).
    """
    cap = ids.shape[0]
    nch = len(cols)
    # Group cotangents by particle with a STABLE sort on the particle id.
    # A 17-operand lax.sort moves payload at ~1.3 ms/channel on v5e (~36 ms
    # total at 3.4M rows) where the argsort + 16-channel gather it replaces
    # cost ~63 ms — TPU gathers are row-dispatch-bound, sorts are
    # bandwidth-bound.
    bf16 = grad_precision == "bf16" and nch % 2 == 0
    if bf16:
        pk = [_pack_pair(cols[2 * i], cols[2 * i + 1])
              for i in range(nch // 2)]
        sorted_pk = jax.lax.sort((ids,) + tuple(pk), num_keys=1)
        sorted_ops = (sorted_pk[0],) + tuple(
            _unpack_bf16_pairs(sorted_pk[1:]))
    else:
        sorted_ops = jax.lax.sort((ids,) + tuple(cols), num_keys=1)
    # Contiguous segments ([ends[p-1], ends[p]) covers [0, total)) reduce in
    # one Pallas pass (ops/pallas/segment_sum.py) — replaces the former
    # stack + [cap, 16] cumsum + 1M-row boundary gather (~42 -> ~11 ms at
    # cap=3.4M; the gather's per-row dispatch dominated).
    import os
    from threedgrut_tpu.ops.pallas import tile_raster
    pallas_ok = (cap % 256 == 0 and not tile_raster._should_interpret()
                 and os.environ.get("THREEDGRUT_SEGSUM", "pallas") != "xla")
    if ends is None and pallas_ok:
        # Compacted subset: segment membership comes from the sorted id
        # column itself (segment_sum_rows_by_ids) — recomputing a dense
        # ends vector would cost a (cap+n)-row sort-searchsorted, measured
        # 26 ms at bench shapes, eating the compaction win.
        from threedgrut_tpu.ops.pallas.segment_sum import (
            segment_sum_rows_by_ids)
        n_pad = -(-n // 256) * 256
        g_cm = jnp.stack(sorted_ops[1:], axis=0)          # [16, cap]
        return segment_sum_rows_by_ids(
            g_cm, sorted_ops[0], n_pad, bf16_values=bf16)[:, :n].T
    if ends is None:
        ne = -(-n // 256) * 256
        ends = jnp.searchsorted(
            sorted_ops[0], jnp.arange(ne, dtype=jnp.int32),
            side="right", method="sort").astype(jnp.int32)
    if pallas_ok:
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
        return segment_sum_rows(g_cm, e_pad, bf16_values=bf16)[:, :n].T
    g_exp = jnp.stack(sorted_ops[1:], axis=-1)
    cum = _blocked_cumsum(g_exp)
    e = jnp.minimum(ends[:n], cap)
    top = jnp.where((e > 0)[:, None], cum[jnp.clip(e - 1, 0, cap - 1)], 0.0)
    prev = jnp.concatenate([jnp.zeros_like(top[:1]), top[:-1]], axis=0)
    return top - prev


def _bwd(grad_precision, res, g_sorted):
    n, sorted_idx, ends, counts = res
    del counts
    nch = g_sorted.shape[1]
    return (unsort_segment_sum(
        sorted_idx, [g_sorted[:, i] for i in range(nch)], n, ends=ends,
        grad_precision=grad_precision), None, None, None)


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


def unsort_gather_segment_sum(idx, g, n):
    """argsort-by-index + row gather + segment sums: the scatter-free gather
    transpose for WIDE cotangent rows ([m, 64] — the 3DGRT bundle path),
    where moving the payload through the sort would cost more than the
    row-dispatch-bound gather (the 33-operand analysis in RESULTS.md; the
    16-channel GUT path makes the opposite choice, unsort_segment_sum).
    idx: [m] int32 (rows with idx >= n discarded); g: [m, F]. Returns
    [n, F]."""
    m = idx.shape[0]
    keys, order = jax.lax.sort(
        (idx, jnp.arange(m, dtype=jnp.int32)), num_keys=1)
    g_sorted = g[order]
    import os
    from threedgrut_tpu.ops.pallas import tile_raster
    if (m % 256 == 0 and g.shape[1] % 8 == 0
            and not tile_raster._should_interpret()
            and os.environ.get("THREEDGRUT_SEGSUM", "pallas") != "xla"):
        # Segment membership straight from the sorted id column
        # (segment_sum_rows_by_ids): no per-index ends vector at all — the
        # (m+n)-row sort-searchsorted it replaces was ~10 ms at the 1M
        # 3DGRT shapes; the kernel's block probes are ~n/256 binary
        # searches.
        from threedgrut_tpu.ops.pallas.segment_sum import (
            segment_sum_rows_by_ids)
        n_pad = -(-n // 256) * 256
        return segment_sum_rows_by_ids(g_sorted.T, keys, n_pad)[:, :n].T
    # method="sort": the default binary search lowers to ~log2(m) rounds of
    # n-row gathers (~190 ms at m=3.1M, n=1M on v5e — row-dispatch bound);
    # the sort-based form is one (m+n)-row bitonic pass (~10 ms).
    ends = jnp.searchsorted(keys, jnp.arange(n, dtype=jnp.int32),
                            side="right", method="sort").astype(jnp.int32)
    cum = _blocked_cumsum(g_sorted)
    top = jnp.where((ends > 0)[:, None], cum[jnp.clip(ends - 1, 0, m - 1)],
                    0.0)
    prev = jnp.concatenate([jnp.zeros_like(top[:1]), top[:-1]], axis=0)
    return top - prev


def _gr_bwd(res, g):
    n, idx = res
    return unsort_gather_segment_sum(idx, g, n), None


gather_rows.defvjp(_gr_fwd, _gr_bwd)
