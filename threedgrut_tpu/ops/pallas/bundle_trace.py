"""Pallas TPU bundle compositor: the 3DGRT trace hot loop, forward + backward.

Replaces the per-ray `argsort([rays, candidates])` + jnp compositing inside
`jax.lax.map` (the round-1 trace path, ~22 ms per 256-ray bundle) with the
tile-compositor machinery of tile_raster.py applied to ray BUNDLES:

  * Grid over bundles (256 arbitrary rays each — the culling cone groups).
  * Candidates arrive depth-sorted along the bundle axis (bundle_candidates'
    top_k key) in CHUNK-aligned windows [W, 64, 256] (fields x candidates);
    each bundle owns the contiguous window range [win_starts[b],
    win_ends[b]) of ONE flat array (render/grt.flatten_candidates), so slot
    counts adapt per bundle with no shared static capacity padding.
  * Compositing walks candidates in BUNDLE order (the 3DGUT "unsorted"
    global-order semantics, applied per bundle). This is exact whenever
    per-ray hit distances do not invert across the bundle-axis order by
    more than the window the sort key already resolves — the reference's
    own k=16 buffer (referenceOptix.cu:210-248) makes the same locality
    assumption. The caller can bound the inversion distance from the cone
    geometry; `render/grt.py` keeps the exact per-ray argsort path as the
    oracle.
  * 3DGRT-specific semantics vs the tile kernel: per-(ray, candidate) SH
    radiance (reference raygen evaluates SH along the actual ray direction,
    gaussianParticles.cuh:43-82) — computed in-kernel as 3 MXU matmuls
    coeff[16, CHUNK]^T-dot-basis[16, PIX] against a per-bundle basis table;
    the front-of-origin and canonical-slab gates of intersectCustomParticle
    (gaussianParticles.cuh:396-436); per-ray initial transmittance (ray row
    7) and t_max segment bound (ray row 6) for hybrid/secondary rays.

Packed candidate rows (ROW64 = 64 floats, SoA within a window):
  rows 0-8   A (world->canonical incl. 1/scale), rows 9-11 mean,
  row 12     opacity (0 for masked/invalid candidates), rows 13-15 pad,
  rows 16-31 SH coefficients red (basis 0..15, zeros beyond),
  rows 32-47 green, rows 48-63 blue.

Rays pack [nb, 8, 256]: rows 0-2 origin, 3-5 unit direction, row 6 t_max
(<= 0 unbounded), row 7 initial transmittance. Output [nb, 8, 256]: rows
0-2 rgb, 3 opacity, 4 depth, 5 final transmittance, 6 hit count, 7 pad.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from threedgrut_tpu import constants as C
from threedgrut_tpu.ops.pallas.tile_raster import (
    CHUNK,
    PIX,
    PREFETCH,
    _N_DBUF,
    _alpha_from_raw,
    _apply_swaps,
    _oddeven_sort,
    _pair_quantities,
    _prefix_prod,
    _should_interpret,
    _tri_matmuls,
)


def _t_excl_resorted(alpha, one_m, hit_t, sorted_passes):
    """Exclusive transmittance product in PER-RAY order, returned in the
    original (bundle-depth) row order, plus the recorded swap masks.

    The per-ray windowed re-sort of the tile kernel (tile_raster.py
    _t_before_excl) adapted to bundles: every row is in play (no tile
    [start, end) range), so rows that composite nothing (alpha == 0: masked
    candidates, rejected hits) are pinned at +inf so they consume no
    transposition passes. Mirrors the reference's per-ray k=16 insertion
    buffer (referenceOptix.cu:210-248) with a 128-wide window and
    `sorted_passes` bounded displacement."""
    if not sorted_passes:
        excl, _ = _prefix_prod(one_m)
        return excl, None
    key = jnp.where(alpha > 0.0, hit_t, jnp.float32(3.4e38))
    (one_m_s,), masks = _oddeven_sort(key, [one_m], sorted_passes)
    excl_s, _ = _prefix_prod(one_m_s)
    return _apply_swaps(masks, excl_s, sorted_passes, inverse=True), masks

ROW64 = 64
_N_WBUF = 4


def _sh_basis_rows(rays, sh_degree: int):
    """Per-bundle SH basis table [16, PIX] from unit ray directions.

    Rows beyond (sh_degree+1)^2 are zero (progressive-SH semantics: inactive
    coefficients do not contribute even if nonzero; ops/sh.py:sh_basis).
    """
    x = rays[3, :][None, :]
    y = rays[4, :][None, :]
    z = rays[5, :][None, :]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rows = [C.SH_C0 * one]
    if sh_degree >= 1:
        rows += [-C.SH_C1 * y, C.SH_C1 * z, -C.SH_C1 * x]
    if sh_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        rows += [
            C.SH_C2[0] * x * y,
            C.SH_C2[1] * y * z,
            C.SH_C2[2] * (2.0 * zz - xx - yy),
            C.SH_C2[3] * x * z,
            C.SH_C2[4] * (xx - yy),
        ]
    if sh_degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        rows += [
            C.SH_C3[0] * y * (3.0 * xx - yy),
            C.SH_C3[1] * x * y * z,
            C.SH_C3[2] * y * (4.0 * zz - xx - yy),
            C.SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C.SH_C3[4] * x * (4.0 * zz - xx - yy),
            C.SH_C3[5] * z * (xx - yy),
            C.SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    rows += [zero] * (16 - len(rows))
    return jnp.concatenate(rows, axis=0)                     # [16, PIX]


def _pair_colors(S, basis):
    """Raw per-(candidate, ray) SH radiance (pre-clamp): 3 x [CHUNK, PIX]."""
    def one(c):
        return jax.lax.dot_general(
            S[16 + 16 * c:32 + 16 * c, :], basis,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + 0.5
    return [one(c) for c in range(3)]


def _grt_gates(q):
    """front-of-origin + canonical slab gates (intersectCustomParticle).

    The jnp path's front test is proj = grd . (-gro) > 0; with the packed
    row's unnormalized v = A d, u = gro that is v . u < 0 (hit_t uses the
    absolute value, so only the gate carries the sign)."""
    return (q["vdotu"] < 0.0) & (q["g"] <= C.MAX_PARTICLE_SQ_DISTANCE)


def _forward_kernel(wstarts_ref, wends_ref, data_hbm, rays_ref, out_ref,
                    dbuf, sem, *, degree, sh_degree, min_transmittance,
                    min_response, min_alpha, max_alpha, sorted_passes=0):
    b = pl.program_id(0)
    w0 = wstarts_ref[b]
    w1 = wends_ref[b]

    rays = rays_ref[0]
    t0 = rays[7, :][None, :]
    out_ref[0] = jnp.zeros((8, PIX), jnp.float32)
    out_ref[0, 5, :] = t0[0]
    basis = _sh_basis_rows(rays, sh_degree)

    def dma(w, slot):
        return pltpu.make_async_copy(data_hbm.at[w], dbuf.at[slot],
                                     sem.at[slot])

    for k in range(PREFETCH):
        @pl.when(w0 + k < w1)
        def _(k=k):
            dma(w0 + k, (w0 + k) % _N_DBUF).start()

    true_mask = jnp.ones((CHUNK, 1), jnp.bool_)

    def body(state):
        w, _ = state
        slot = w % _N_DBUF
        dma(w, slot).wait()

        @pl.when(w + PREFETCH < w1)
        def _():
            dma(w + PREFETCH, (w + PREFETCH) % _N_DBUF).start()

        S = dbuf[slot]
        q = _pair_quantities(S, rays, degree)
        alpha, _ = _alpha_from_raw(q, true_mask & _grt_gates(q),
                                   min_response, min_alpha, max_alpha)
        # Prefix PRODUCT of (1 - alpha) (tile_raster._prefix_prod): replaces
        # the former log1p/cumsum/exp round trip — two transcendental
        # [CHUNK, PIX] passes per window — with shifted multiplies. With
        # sorted_passes > 0 the product runs in per-ray re-sorted order.
        one_m = 1.0 - alpha
        excl, _ = _t_excl_resorted(alpha, one_m, q["hit_t"], sorted_passes)
        t_carry = out_ref[0, 5, :][None, :]
        t_before = t_carry * excl
        live = t_before > min_transmittance
        w_ = jnp.where(live, alpha * t_before, 0.0)

        cols = _pair_colors(S, basis)
        for c in range(3):
            out_ref[0, c, :] += jnp.sum(w_ * jnp.maximum(cols[c], 0.0),
                                        axis=0)
        out_ref[0, 3, :] += jnp.sum(w_, axis=0)
        out_ref[0, 4, :] += jnp.sum(w_ * q["hit_t"], axis=0)
        out_ref[0, 6, :] += jnp.sum((w_ > 0.0).astype(jnp.float32), axis=0)
        # Carry = min over LIVE rows of T-after-row, floored at the incoming
        # carry (transmittance is monotone along compositing order and
        # frozen at termination — same order-independent form as the tile
        # kernel).
        t_after = jnp.where(live, t_before * one_m, jnp.float32(3.4e38))
        out_ref[0, 5, :] = jnp.minimum(jnp.min(t_after, axis=0), t_carry[0])
        alive = jnp.any(out_ref[0, 5, :] > min_transmittance)
        return w + 1, alive

    def cond(state):
        w, alive = state
        return (w < w1) & alive

    wf, _ = jax.lax.while_loop(cond, body, (w0, jnp.bool_(True)))

    # Free diagnostics in the pad row (tile_raster convention): windows this
    # bundle actually WALKED before the early exit. Consumed by the fused
    # walked-compaction backward (ops/fused_raster.py) and the stage bench;
    # nothing downstream reads row 7.
    out_ref[0, 7, :] = jnp.full((PIX,), (wf - w0).astype(jnp.float32))

    for k in range(PREFETCH):
        @pl.when(wf + k < w1)
        def _(k=k):
            dma(wf + k, (wf + k) % _N_DBUF).wait()


def _backward_kernel(wstarts_ref, wends_ref, data_hbm, rays_ref, fwd_ref,
                     gout_ref, zeros_hbm, gdata_hbm, dbuf, wbuf, sem, wsem,
                     wstate, *, degree, sh_degree, min_transmittance,
                     min_response, min_alpha, max_alpha, sorted_passes=0):
    """Front-to-back re-walk with the suffix-residual trick (tile_raster
    _backward_kernel); SH-coefficient gradients are basis-contracted MXU
    matmuls. Gradient windows are bundle-exclusive (window ranges are
    CHUNK-aligned and disjoint across bundles), written through an
    overlapped ring; the pre-zeroed donor covers skipped/tail windows."""
    del zeros_hbm
    b = pl.program_id(0)
    w0 = wstarts_ref[b]
    w1 = wends_ref[b]

    @pl.when(b == 0)
    def _():
        wstate[0] = 0
        for s in range(_N_WBUF):
            wstate[1 + s] = -1

    def dma_data(w, slot):
        return pltpu.make_async_copy(data_hbm.at[w], dbuf.at[slot],
                                     sem.at[slot])

    def wait_write(s):
        @pl.when(wstate[1 + s] >= 0)
        def _():
            pltpu.make_async_copy(wbuf.at[s], gdata_hbm.at[wstate[1 + s]],
                                  wsem.at[s]).wait()
        wstate[1 + s] = -1

    for k in range(PREFETCH):
        @pl.when(w0 + k < w1)
        def _(k=k):
            dma_data(w0 + k, (w0 + k) % _N_DBUF).start()

    rays = rays_ref[0]
    t0 = rays[7, :][None, :]
    basis = _sh_basis_rows(rays, sh_degree)
    dC = gout_ref[0, 0:3, :]
    dO = gout_ref[0, 3, :][None, :]
    dD = gout_ref[0, 4, :][None, :]
    dT = gout_ref[0, 5, :][None, :]
    t_final = fwd_ref[0, 5, :][None, :]
    a_tot = (fwd_ref[0, 0, :] * dC[0, :] + fwd_ref[0, 1, :] * dC[1, :]
             + fwd_ref[0, 2, :] * dC[2, :]
             + fwd_ref[0, 3, :] * dO[0, :]
             + fwd_ref[0, 4, :] * dD[0, :])[None, :]

    true_mask = jnp.ones((CHUNK, 1), jnp.bool_)

    def body(state):
        w, t_carry_v, prefix_v = state
        slot = w % _N_DBUF
        dma_data(w, slot).wait()

        @pl.when(w + PREFETCH < w1)
        def _():
            dma_data(w + PREFETCH, (w + PREFETCH) % _N_DBUF).start()

        S = dbuf[slot]
        q = _pair_quantities(S, rays, degree)
        alpha, accept = _alpha_from_raw(q, true_mask & _grt_gates(q),
                                        min_response, min_alpha, max_alpha)
        one_m = 1.0 - alpha
        excl, masks = _t_excl_resorted(alpha, one_m, q["hit_t"],
                                       sorted_passes)
        t_before = t_carry_v[None, :] * excl
        live = t_before > min_transmittance
        w_ = jnp.where(live, alpha * t_before, 0.0)

        cols = _pair_colors(S, basis)
        colc = [jnp.maximum(c, 0.0) for c in cols]
        qj = (colc[0] * dC[0, :][None, :] + colc[1] * dC[1, :][None, :]
              + colc[2] * dC[2, :][None, :] + q["hit_t"] * dD + dO)

        wq = w_ * qj
        if sorted_passes:
            # Suffix over COMPOSITING (per-ray re-sorted) order: route wq
            # through the recorded network, prefix there, route back.
            wq_s = _apply_swaps(masks, wq, sorted_passes, inverse=False)
            incl_s = _tri_matmuls(wq_s, strict_lower=False)
            suffix_s = a_tot - prefix_v[None, :] - incl_s
            suffix = _apply_swaps(masks, suffix_s, sorted_passes,
                                  inverse=True)
        else:
            incl = _tri_matmuls(wq, strict_lower=False)
            suffix = a_tot - prefix_v[None, :] - incl

        inv_one_m = 1.0 / jnp.maximum(one_m, 1e-6)
        d_alpha = jnp.where(
            w_ > 0.0,
            t_before * qj - suffix * inv_one_m - dT * t_final * inv_one_m,
            0.0)

        unclamped = (q["alpha_raw"] < max_alpha) & accept
        d_resp = jnp.where(unclamped, q["opacity"] * d_alpha, 0.0)
        d_opacity_pair = jnp.where(unclamped, q["resp"] * d_alpha, 0.0)
        d_g = d_resp * q["dresp_dg"]

        d_hit = jnp.where(w_ > 0.0, w_ * dD, 0.0)
        sign_m = jnp.sign(q["vdotu"])
        d_m = sign_m * q["inv_vsq"] * d_hit
        d_crsq = d_g * q["inv_vsq"]
        d_vsq = (-q["g"] * q["inv_vsq"]) * d_g \
            + (-q["hit_t"] * q["inv_vsq"]) * d_hit

        u, v, cr = q["u"], q["v"], q["cr"]
        # Exact cross form (the cheaper triple-product identity fails
        # gradcheck — cancellation; see tile_raster._backward_kernel).
        crxv = [cr[1] * v[2] - cr[2] * v[1],
                cr[2] * v[0] - cr[0] * v[2],
                cr[0] * v[1] - cr[1] * v[0]]
        uxcr = [u[1] * cr[2] - u[2] * cr[1],
                u[2] * cr[0] - u[0] * cr[2],
                u[0] * cr[1] - u[1] * cr[0]]
        du = [2.0 * d_crsq * crxv[i] + d_m * v[i] for i in range(3)]
        dv = [2.0 * d_crsq * uxcr[i] + d_m * u[i] + 2.0 * d_vsq * v[i]
              for i in range(3)]

        o1 = jnp.concatenate([rays[0:3, :], jnp.ones((1, PIX), jnp.float32)],
                             axis=0)
        M = [jax.lax.dot_general(
            o1, du[r], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) for r in range(3)]
        N = [jax.lax.dot_general(
            rays[3:6, :], dv[r], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) for r in range(3)]
        rows = [M[r][k][None, :] - S[9 + k, :][None, :] * M[r][3][None, :]
                + N[r][k][None, :]
                for r in range(3) for k in range(3)]
        rows += [-(S[0 * 3 + k, :][None, :] * M[0][3][None, :]
                   + S[1 * 3 + k, :][None, :] * M[1][3][None, :]
                   + S[2 * 3 + k, :][None, :] * M[2][3][None, :])
                 for k in range(3)]
        rows.append(jnp.sum(d_opacity_pair, axis=1)[None, :])
        rows.append(jnp.zeros((3, CHUNK), jnp.float32))
        # SH-coefficient grads: d coeff[c, k, cand] = sum_ray basis[k, ray]
        # * w_ * dC_c * [raw color > 0] (the use-time clamp gate).
        gsh = [jax.lax.dot_general(
            basis,
            jnp.where(cols[c] > 0.0, w_ * dC[c, :][None, :], 0.0),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) for c in range(3)]
        G = jnp.concatenate(rows + gsh, axis=0)              # [ROW64, CHUNK]

        k = wstate[0]
        s = k % _N_WBUF
        wait_write(s)
        wbuf[s] = G
        pltpu.make_async_copy(wbuf.at[s], gdata_hbm.at[w],
                              wsem.at[s]).start()
        wstate[1 + s] = w
        wstate[0] = k + 1

        t_carry_new = jnp.minimum(jnp.min(
            jnp.where(live, t_before * one_m, jnp.float32(3.4e38)), axis=0),
            t_carry_v)
        prefix_new = prefix_v + jnp.sum(wq, axis=0)
        return w + 1, t_carry_new, prefix_new

    def cond(state):
        w, t_carry_v, _ = state
        return (w < w1) & jnp.any(t_carry_v > min_transmittance)

    wf, _, _ = jax.lax.while_loop(cond, body, (w0, t0[0], jnp.zeros(
        (PIX,), jnp.float32)))

    for k in range(PREFETCH):
        @pl.when(wf + k < w1)
        def _(k=k):
            dma_data(wf + k, (wf + k) % _N_DBUF).wait()

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        for s in range(_N_WBUF):
            wait_write(s)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def bundle_composite(
    data: jnp.ndarray,          # [capF, ROW64] packed candidate rows (flat)
    rays: jnp.ndarray,          # [nb, 8, 256]
    win_starts: jnp.ndarray,    # [nb] int32 first window of each bundle
    win_ends: jnp.ndarray,      # [nb] int32 one-past-last window
    degree: int,
    sh_degree: int,
    min_transmittance: float,
    min_response: float = C.MIN_KERNEL_RESPONSE,
    min_alpha: float = C.MIN_ALPHA,
    max_alpha: float = C.MAX_ALPHA,
    sorted_passes: int = 0,
) -> jnp.ndarray:
    """Returns [nb, 8, 256] forward buffer (see module docstring).

    Candidates live in ONE flat row array; bundle b walks windows
    [win_starts[b], win_ends[b]) of the [W, ROW64, CHUNK] window layout —
    per-bundle ranges are CHUNK-aligned and disjoint (the flat-compacted
    layout built by render/grt.flatten_candidates; the former dense
    [nb, cap] layout is the special case starts = b*cap/CHUNK). data rows
    must be a multiple of CHUNK; candidates depth-ascending within each
    bundle with masked/pad slots carrying opacity 0. No gradient flows to
    `rays` (ray positions are inputs of the caller's raygen, differentiated
    there when needed via the jnp path). `sorted_passes` > 0 composites each
    ray in per-ray re-sorted hit order (odd-even transposition bounded at
    that many positions per 128-candidate window — the fast-path analogue
    of the reference's per-ray sorted k=16 hit buffer)."""
    return _forward(data, rays, win_starts, win_ends, degree, sh_degree,
                    min_transmittance, min_response, min_alpha, max_alpha,
                    sorted_passes)


def _to_windows(data: jnp.ndarray) -> jnp.ndarray:
    rows = data.shape[0]
    assert rows % CHUNK == 0 and data.shape[1] == ROW64
    return data.reshape(rows // CHUNK, CHUNK, ROW64).transpose(0, 2, 1)


def _forward(data, rays, win_starts, win_ends, degree, sh_degree,
             min_transmittance, min_response, min_alpha, max_alpha,
             sorted_passes=0):
    nb = rays.shape[0]
    wdata = _to_windows(data)
    kern = functools.partial(
        _forward_kernel, degree=degree, sh_degree=sh_degree,
        min_transmittance=min_transmittance, min_response=min_response,
        min_alpha=min_alpha, max_alpha=max_alpha,
        sorted_passes=sorted_passes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_DBUF, ROW64, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_DBUF,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 8, PIX), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_should_interpret(),
    )(win_starts, win_ends, wdata, rays)


def _fwd_rule(data, rays, win_starts, win_ends, degree, sh_degree,
              min_transmittance, min_response, min_alpha, max_alpha,
              sorted_passes=0):
    out = _forward(data, rays, win_starts, win_ends, degree, sh_degree,
                   min_transmittance, min_response, min_alpha, max_alpha,
                   sorted_passes)
    return out, (data, rays, win_starts, win_ends, out)


def _bwd_rule(degree, sh_degree, min_transmittance, min_response, min_alpha,
              max_alpha, sorted_passes, res, g_out):
    data, rays, win_starts, win_ends, out = res
    g_windows = _backward_windows(
        data, rays, win_starts, win_ends, out, g_out, degree=degree,
        sh_degree=sh_degree, min_transmittance=min_transmittance,
        min_response=min_response, min_alpha=min_alpha, max_alpha=max_alpha,
        sorted_passes=sorted_passes)
    g_data = g_windows.transpose(0, 2, 1).reshape(-1, ROW64)
    return g_data, None, None, None


def _backward_windows(data, rays, win_starts, win_ends, out, g_out, *,
                      degree, sh_degree, min_transmittance, min_response,
                      min_alpha, max_alpha, sorted_passes):
    """Backward kernel pass returning per-slot gradients in WINDOW layout
    [W, ROW64, CHUNK] (for the fused walked-compaction backward,
    ops/fused_raster.py)."""
    nb = rays.shape[0]
    wdata = _to_windows(data)
    kern = functools.partial(
        _backward_kernel, degree=degree, sh_degree=sh_degree,
        min_transmittance=min_transmittance, min_response=min_response,
        min_alpha=min_alpha, max_alpha=max_alpha,
        sorted_passes=sorted_passes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, PIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_N_DBUF, ROW64, CHUNK), jnp.float32),
            pltpu.VMEM((_N_WBUF, ROW64, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_DBUF,)),
            pltpu.SemaphoreType.DMA((_N_WBUF,)),
            pltpu.SMEM((1 + _N_WBUF,), jnp.int32),
        ],
    )
    zeros = jnp.zeros(wdata.shape, jnp.float32)
    g_windows = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(wdata.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        # Donor index counts after the 2 scalar-prefetch operands:
        # data, rays, out, g_out, zeros -> 6; aliased into the output.
        input_output_aliases={6: 0},
        interpret=_should_interpret(),
    )(win_starts, win_ends, wdata, rays, out, g_out, zeros)
    return g_windows


bundle_composite.defvjp(_fwd_rule, _bwd_rule)
