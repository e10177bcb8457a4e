"""Fused backward kernels for sage attention (Pallas / Mosaic).

The reference is forward-only; this framework's training path previously
recomputed gradients through jax's flash-attention.  These kernels make
the backward first-class AND quantization-consistent: P is recomputed
from the SAME int8 Q/K products and base-2 LSE the forward produced, so
the gradient is the straight-through gradient of the actual quantized
forward (scales treated as constants), not of a different bf16 kernel.

Math (natural units; the kernel works in the base-2 folded domain):

    P    = exp2(L2 - lse2)          L2 = s_i32 * q_scale * k_scale
    dV   = P^T . dO
    dP   = dO . V^T
    dS   = P * (dP - D)             D = rowsum(dO * O)
    dQ   = dS . K * sm_scale        (K may be the smoothed K: softmax row
                                     gradients are invariant to the
                                     per-row constant the smoothing drops)
    dK   = dS^T . Q * sm_scale

Structure: unlike the forward there is NO online-softmax chain — P comes
straight from the saved LSE — so each (q block, kv block) pair is
independent MXU work (2 int8/bf16 matmuls + exp2 + 1-2 more matmuls) and
the kernels are plain block-accumulation loops:

* ``_dq_kernel``  — grid (b, hq, nq, nkv), accumulates dQ per Q block
  (GQA: K-side index maps use ih // rep).
* ``_dkv_kernel`` — grid (b, hkv, nkv, rep*nq): the GQA group rides the
  4th axis so dK/dV group-sum in scratch — O(hkv) memory.

Causal uses the same clamped-index-map early exit as the forward
(reference: sm89.cuh:225-229), from below for dq and from above for dkv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _dequant_l2(s_i32, ks_ref, col0, chunk_k, scale_group, axis):
    """Dequantize one int32 score tile to base-2 logits (K-scale side
    only; the caller multiplies the per-row Q scale in afterwards).

    One SMEM K scale covers ``scale_group`` global KV columns; ``col0``
    is the tile's first global KV column (a multiple of ``chunk_k``).
    When the forward quantized K with groups NARROWER than the compute
    chunk (the r4 vt retune runs 256-wide groups at d <= 128), the tile
    spans ``chunk_k // scale_group`` groups and dequantizes per segment —
    this is what lets the backward keep its measured-wide MXU/VPU tiles
    while staying bit-consistent with the forward's quantization (the r4
    regression: deriving chunk_k from the narrowed group collapsed the
    backward to 256-wide tiles, 12.9 ms vs 7.9 ms at the tracked shape).
    ``axis`` is the KV axis of the tile (1 for [rows_q, chunk] scores,
    0 for the transposed [chunk, rows_q] of the dkv kernel)."""
    sf = s_i32.astype(jnp.float32)
    base = col0 // scale_group
    if chunk_k <= scale_group:
        return sf * ks_ref[0, 0, 0, base]
    n_sg = chunk_k // scale_group
    if axis == 1:
        segs = [
            sf[:, g * scale_group:(g + 1) * scale_group]
            * ks_ref[0, 0, 0, base + g]
            for g in range(n_sg)
        ]
    else:
        segs = [
            sf[g * scale_group:(g + 1) * scale_group, :]
            * ks_ref[0, 0, 0, base + g]
            for g in range(n_sg)
        ]
    return jnp.concatenate(segs, axis=axis)


def _dq_kernel(
    qi8_ref, qs_ref, ki8_ref, ks_ref, kbf_ref, v_ref, do_ref, lse_ref,
    dvec_ref, *rest,
    causal, n_kv, block_q, block_k, sm_scale, n_chunks, chunk_k,
    scale_group, window, fold_r=None, n_q=None, band_kv_grid=False,
    vt_out=False, has_bias=False, emit_dbias=False,
):
    # optional additive-bias operand and dS (== dBias) output ride at
    # the end of the ref list (bias training through the fused kernels;
    # the reference is forward-only and the bias grad would otherwise
    # need the score-materializing exact VJP)
    pos = 0
    bias_ref = rest[pos] if has_bias else None
    pos += has_bias
    dq_ref = rest[pos]
    dbias_ref = rest[pos + 1] if emit_dbias else None
    acc = rest[-1]
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    init = kv_idx == 0
    if fold_r is not None:
        # causal fold grid (see the forward's fold): q rows f and
        # n_q-1-f pack into one row of n_kv+1 all-live steps; row f's
        # last kv block is f // fold_r, so step j <= f//fold_r belongs
        # to row f and the rest to the complement row.  The decoded
        # kv_idx == 0 at both segment starts, so the init condition is
        # the decoded one; the epilogue (kv_idx == last_kv) holds
        # unchanged on the decoded indices.
        c1m1 = q_idx // fold_r
        first = kv_idx <= c1m1
        q_idx, kv_idx = (
            jnp.where(first, q_idx, n_q - 1 - q_idx),
            jnp.where(first, kv_idx, kv_idx - c1m1 - 1),
        )
        init = kv_idx == 0
    elif band_kv_grid:
        # sliding band grid (window): the kv axis covers only the blocks
        # the window can reach, offset per q row (init on the RAW first
        # step — the offset row never visits kv 0); steps past the
        # diagonal fail should_run (the index maps clamp their DMAs).
        # The OFFSET clamps to n_kv-1 (not the sum — that would re-visit
        # the diagonal and double-count): q rows whose window lies wholly
        # past the KV length then still visit last_kv on step 0 and the
        # epilogue writes their true zero gradient.
        kv_idx = kv_idx + jnp.minimum(
            jnp.maximum((q_idx * block_q - (window - 1)) // block_k, 0),
            n_kv - 1,
        )

    @pl.when(init)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    if causal:
        should_run = kv_idx * block_k <= q_idx * block_q + (block_q - 1)
        if window is not None:
            should_run = jnp.logical_and(
                should_run,
                kv_idx * block_k + block_k - 1
                > q_idx * block_q - window,
            )
    else:
        should_run = True

    if emit_dbias and causal:
        # grid steps above the diagonal never run the body; their dS
        # output blocks must still be zero (the launcher disables the
        # fold/band grids when emitting dS so every block has a step)
        @pl.when(jnp.logical_not(should_run))
        def _zero_dbias():
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    @pl.when(should_run)
    def _body():
        qs = qs_ref[0, 0]          # [bq, 1] f32 (sm_scale*log2e folded)
        lse = lse_ref[0, 0]        # [bq, 1] f32 (base 2)
        dvec = dvec_ref[0, 0]      # [bq, 1] f32
        do = do_ref[0, 0]          # [bq, d] bf16
        if has_bias:
            # fully -inf-bias rows have lse == -inf; sanitize so their
            # p comes out 0 (zero grads) instead of exp2(-inf + inf)=NaN
            lse = jnp.where(lse == -jnp.inf, 0.0, lse)
        for c in range(n_chunks):
            cols = slice(c * chunk_k, (c + 1) * chunk_k)
            k_i8 = ki8_ref[0, 0, cols, :]
            s_i32 = jax.lax.dot_general(
                qi8_ref[0, 0], k_i8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            l2 = _dequant_l2(
                s_i32, ks_ref, kv_idx * block_k + c * chunk_k,
                chunk_k, scale_group, axis=1,
            ) * qs
            if has_bias:
                # the forward's lse2 includes the bias — P only
                # normalizes when the recomputed logits do too; -inf
                # entries clamp finite (exp2 underflows to exactly 0)
                l2 = jnp.maximum(
                    l2 + bias_ref[0, 0, :, cols].astype(jnp.float32)
                    * LOG2E,
                    -1e30,
                )
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, l2.shape, 0)
                col = jax.lax.broadcasted_iota(jnp.int32, l2.shape, 1)
                gcol = col + kv_idx * block_k + c * chunk_k
                grow = row + q_idx * block_q
                keep = gcol <= grow
                if window is not None:
                    keep = jnp.logical_and(keep, gcol > grow - window)
                p = jnp.where(keep, jnp.exp2(l2 - lse), 0.0)
            else:
                p = jnp.exp2(l2 - lse)
            dp = jax.lax.dot_general(
                do, v_ref[0, 0, cols, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, ck]
            ds_f = p * (dp - dvec)
            if emit_dbias:
                # dL/dBias == dL/dS (the bias adds to the logits
                # post-scale), written blockwise — no score-sized
                # temporaries beyond the dS output itself
                dbias_ref[0, 0, :, cols] = ds_f.astype(dbias_ref.dtype)
            ds = ds_f.astype(jnp.bfloat16)
            if vt_out:
                # transposed accumulation (d <= 64): dQ^T = K^T . dS^T
                # puts block_q on the output lane axis — the dS.K form's
                # 64 output lanes waste half the MXU (the forward's vt
                # rescue, applied to the gradient's accumulation matmul)
                acc[...] += jax.lax.dot_general(
                    kbf_ref[0, 0, cols, :], ds, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [d, bq]
            else:
                acc[...] += jax.lax.dot_general(
                    ds, kbf_ref[0, 0, cols, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    if causal:
        last_kv = jnp.minimum(
            n_kv - 1, (q_idx * block_q + block_q - 1) // block_k
        )
    else:
        last_kv = n_kv - 1

    @pl.when(kv_idx == last_kv)
    def _epi():
        if vt_out:
            # one in-kernel transpose per Q block (amortized over the
            # whole KV row) restores the public [bq, d] layout
            dq_ref[0, 0] = jnp.swapaxes(acc[...], 0, 1) * sm_scale
        else:
            dq_ref[0, 0] = acc[...] * sm_scale


def _dkv_kernel(
    ki8_ref, ks_ref, qi8_ref, qs_ref, qbf_ref, v_ref, do_ref, lse_ref,
    dvec_ref, *rest,
    causal, n_q, block_q, block_k, sm_scale, n_chunks, chunk_k,
    scale_group, rep, window, band_q=None, vt_out=False,
    has_bias=False,
):
    # optional PRE-TRANSPOSED bias operand [sk, sq] blocks at the end of
    # the inputs (the score tile here is [ck, bq]; an in-kernel per-chunk
    # transpose of a [bq, ck] bias tile would cost more than the one
    # XLA bias.T pass the launcher does)
    biast_ref = rest[0] if has_bias else None
    dk_ref, dv_ref = rest[has_bias:has_bias + 2]
    dk_acc, dv_acc = rest[has_bias + 2:has_bias + 4]
    """Grid (b, hkv, n_kv, rep * n_q): the GQA group rides the 4th axis
    (t -> q head ih*rep + t // n_q, q block t % n_q) so dK/dV accumulate
    over the whole group IN scratch — O(hkv) memory, no jnp.repeat
    expansion of K/V.

    ``band_q`` (window): the per-member q range shrinks to the blocks
    within the window's reach of this KV block, starting at the
    diagonal — grid axis 3 becomes rep * band_q."""
    kv_idx = pl.program_id(2)
    t_idx = pl.program_id(3)
    if band_q is None:
        q_idx = t_idx % n_q
        n_steps = rep * n_q
    else:
        q_idx = (kv_idx * block_k) // block_q + t_idx % band_q
        n_steps = rep * band_q

    @pl.when(t_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    if causal:
        # only q blocks intersecting or below the diagonal contribute
        should_run = q_idx * block_q + (block_q - 1) >= kv_idx * block_k
        if window is not None:
            # ... and within the sliding window's reach of this KV block
            should_run = jnp.logical_and(
                should_run,
                q_idx * block_q - window
                < kv_idx * block_k + block_k - 1,
            )
        if band_q is not None:
            # band steps can overshoot the last real q block
            should_run = jnp.logical_and(should_run, q_idx < n_q)
    else:
        should_run = True

    @pl.when(should_run)
    def _body():
        qs = qs_ref[0, 0]     # [bq, 1]
        lse = lse_ref[0, 0]   # [bq, 1]
        dvec = dvec_ref[0, 0]
        do = do_ref[0, 0]     # [bq, d]
        if has_bias:
            # see _dq_kernel: dead (-inf lse) rows get p = 0, not NaN
            lse = jnp.where(lse == -jnp.inf, 0.0, lse)
        for c in range(n_chunks):
            rows = slice(c * chunk_k, (c + 1) * chunk_k)
            k_i8 = ki8_ref[0, 0, rows, :]
            # transposed scores: [ck, bq]
            st_i32 = jax.lax.dot_general(
                k_i8, qi8_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            l2t = _dequant_l2(
                st_i32, ks_ref, kv_idx * block_k + c * chunk_k,
                chunk_k, scale_group, axis=0,
            ) * qs[:, 0][None, :]
            if has_bias:
                l2t = jnp.maximum(
                    l2t + biast_ref[0, 0, rows, :].astype(jnp.float32)
                    * LOG2E,
                    -1e30,
                )
            if causal:
                krow = jax.lax.broadcasted_iota(jnp.int32, l2t.shape, 0)
                qcol = jax.lax.broadcasted_iota(jnp.int32, l2t.shape, 1)
                gk = krow + kv_idx * block_k + c * chunk_k
                gq = qcol + q_idx * block_q
                keep = gk <= gq
                if window is not None:
                    keep = jnp.logical_and(keep, gk > gq - window)
                pt = jnp.where(keep, jnp.exp2(l2t - lse[:, 0][None, :]), 0.0)
            else:
                pt = jnp.exp2(l2t - lse[:, 0][None, :])
            if vt_out:
                # transposed accumulation (d <= 64): dV^T = dO^T . P and
                # dK^T = Q^T . dS^T put the chunk on the output lanes
                # (full MXU width) instead of d = 64
                dv_acc[:, rows] += jax.lax.dot_general(
                    do, pt.astype(jnp.bfloat16), (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [d, ck]
            else:
                dv_acc[rows, :] += jax.lax.dot_general(
                    pt.astype(jnp.bfloat16), do, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dpt = jax.lax.dot_general(
                v_ref[0, 0, rows, :], do, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [ck, bq]
            dst = (pt * (dpt - dvec[:, 0][None, :])).astype(jnp.bfloat16)
            if vt_out:
                dk_acc[:, rows] += jax.lax.dot_general(
                    qbf_ref[0, 0], dst, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [d, ck]
            else:
                dk_acc[rows, :] += jax.lax.dot_general(
                    dst, qbf_ref[0, 0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    @pl.when(t_idx == n_steps - 1)
    def _epi():
        if vt_out:
            # one transpose per KV block, amortized over rep * n_q steps
            dk_ref[0, 0] = jnp.swapaxes(dk_acc[...], 0, 1) * sm_scale
            dv_ref[0, 0] = jnp.swapaxes(dv_acc[...], 0, 1)
        else:
            dk_ref[0, 0] = dk_acc[...] * sm_scale
            dv_ref[0, 0] = dv_acc[...]


def _fit_block(s: int, candidates) -> int | None:
    for c in candidates:
        if s % c == 0:
            return c
    return None


def quantized_attention_vjp(
    q, k, v, do, *, is_causal: bool, sm_scale: float | None,
    o=None, lse_nat=None, dlse=None, smooth_k: bool = True,
    window: int | None = None, pv_dtype: str = "bf16",
    smooth_v: bool = False, attn_bias=None, need_dbias: bool = False,
    fwd_res=None, interpret: bool = False,
):
    """Full recomputed backward through the fused kernels.

    Quantizes Q/K exactly as the forward does, then runs the fused
    dq/dkv kernels.  When the forward's output ``o`` and natural-log
    ``lse_nat`` (the public corrected LSE) are supplied as residuals,
    the forward recompute is skipped entirely — the kernel's raw base-2
    LSE is reconstructed by inverting the smooth-k correction.  GQA is
    native: dK/dV group-sum inside the dkv kernel, O(hkv) memory.

    ``fwd_res``: optional dict of quantized-operand residuals captured
    by the forward (core._sageattn_hnd ``residual_sink``): ``k_i8`` /
    ``k_scale`` / ``km`` (the forward's exact K codes at ITS chunk
    width), ``v_q`` / ``v_scale`` / ``v_mean``, and the raw base-2
    ``lse2``.  Each present key skips the corresponding recompute pass
    here — and makes the reconstruction exact for whatever chunk_k the
    forward's (possibly tuned) config actually used.

    ``dlse``: optional cotangent of the natural-log LSE output
    [b, hq, sq].  d(lse)/dS_ij = P_ij, so it enters the kernels as
    dS = P * (dP - (dvec - dlse)) — a pure input adjustment, no kernel
    change (this is what makes ``return_lse=True`` differentiable
    without materializing scores; the ring-attention merge backward
    rides on it).  Note dlse also contributes dQ += dlse * km * sm_scale
    through the smooth-k LSE correction term, handled here.

    Returns (dq, dk, dv) in the input dtypes, or None when the shape
    doesn't fit the kernels (caller falls back to the flash/XLA
    recompute).
    """
    from sageattention_tpu import quant as quant_mod
    from sageattention_tpu.ops import attention_pallas, quant_pallas

    b, hq, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    if sm_scale is None:
        sm_scale = d**-0.5
    if attn_bias is not None:
        # fused bias backward: per-head full-shape bias, residuals
        # required (the in-vjp forward recompute doesn't model bias),
        # no window band.  Anything else -> exact fallback upstream.
        if (
            attn_bias.shape != (b, hq, sq, sk)
            or o is None or lse_nat is None
            or window is not None
        ):
            return None
    elif need_dbias:
        return None
    # The K quantization group MUST equal the forward's chunk width: the
    # saved lse2 was computed from those exact int8 products, and P =
    # exp2(l2 - lse2) only row-normalizes when the recomputed l2 matches.
    # The fused backward is only reachable when the forward ran with the
    # default config (autodiff gates on _FUSED_BWD_KWARGS), so recompute
    # it.  The kernels' own compute chunk is independent — the SMEM scale
    # index derives from the chunk's global column, and a chunk WIDER
    # than the group dequantizes per group segment (_dequant_l2) — so
    # the group only pins the quantizer, never the tile sizes.
    # vt mirrors core._entry's vt_hint: the fused-bwd region has no
    # masks/segments/bias, so the gate reduces to the shared head-dim
    # eligibility (one helper for both sides — r4 advisor finding).
    use_vt = attention_pallas.vt_eligible_head_dim(d)
    fwd_res = dict(fwd_res) if fwd_res else {}
    if fwd_res.get("k_i8") is not None and fwd_res.get(
            "k_scale") is not None:
        # the forward's actual K codes: derive the group from the scale
        # count (shape-static) instead of re-deriving the config — exact
        # for whatever chunk the forward's tuned config used
        n_groups = fwd_res["k_scale"].shape[-1]
        if sk % n_groups:
            fwd_res.pop("k_i8"), fwd_res.pop("k_scale")
            scale_group = None
        else:
            scale_group = sk // n_groups
    else:
        scale_group = None
    if scale_group is None:
        scale_group = attention_pallas.default_config(
            sq, sk, d, is_causal, vt=use_vt
        )[3]
        if sk % scale_group and sk > scale_group:
            # the forward's quantizer fell back to a ragged-group layout
            # the kernels' scale indexing does not model
            return None
        if sk <= scale_group:
            scale_group = sk  # single group covers the whole row
    if sq % 128 or sk % 128:
        # unaligned user shapes go to the padded flash/exact fallback
        # (the fused kernels expect the forward's padded tile discipline)
        return None
    if is_causal and window is None:
        # FINE KV blocking on the causal triangle: the dkv grid skips
        # dead (above-diagonal) q steps per KV block, so block_k == sk
        # makes every step live and pays the full rectangle.  On-chip
        # sweep at b4h16s4096hd128 (r5, all-grads protocol): bk=4096
        # 10.07 ms -> bk=1024 7.91 -> bq=bk=1024 7.52 ms.  bq=1024
        # also halves the dq fold-grid step count.
        block_q = _fit_block(sq, (1024, 512, 256, 128))
        block_k = _fit_block(sk, (1024, 512, 256, 128))
    else:
        block_q = _fit_block(sq, (512, 256, 128))
        if sk <= 4096:
            block_k = sk
        else:
            block_k = _fit_block(sk, (4096, 2048, 1024, 512, 256, 128))
    if block_q is None or block_k is None or d % 64 or d > 256:
        return None
    chunk_k = _fit_block(
        block_k,
        # wide chunks are the backward's measured preference (narrow
        # score tiles are VPU-inefficient in the normal orientation:
        # 12.9 -> 7.9 ms at b4h16s4096hd128 causal).  The chunk must
        # either divide the K-quant group (one scale per chunk) or be a
        # multiple of it (per-segment dequant in _dequant_l2) — the r4
        # narrow vt groups take the second branch.
        [c for c in (2048, 1024, 512, 256, 128)
         if c % scale_group == 0 or scale_group % c == 0],
    ) or block_k
    if block_k % chunk_k:
        return None
    if chunk_k % scale_group and scale_group % chunk_k:
        return None

    rep = hq // hkv  # GQA handled natively by the dkv kernel grid

    # The V the forward ACTUALLY multiplied: with a quantized-V pv_dtype
    # the saved o (and hence D = rowsum(dO*O)) reflects dequant(V_q);
    # feeding raw V into the kernels' dP matmul would break the softmax
    # gradient identity sum_j dS_ij = 0 by the V-quantization error.
    # Straight-through dV is P^T.dO either way (scales are constants).
    if pv_dtype in ("int8", "fp8", "fp8_e5m2"):
        if fwd_res.get("v_q") is not None:
            # forward-captured codes: dequant only (skips the quantize
            # pass AND uses the exact V the forward multiplied)
            v_q = fwd_res["v_q"]
            v_scale = fwd_res["v_scale"]
            v_mean = fwd_res.get("v_mean")
        else:
            vdt = {
                "int8": jnp.int8,
                "fp8": jnp.float8_e4m3fn,
                "fp8_e5m2": jnp.float8_e5m2,
            }[pv_dtype]
            v_q, v_scale, v_mean = quant_mod.per_channel_quant(
                v, dtype=vdt, smooth=smooth_v
            )
        v_eff = v_q.astype(jnp.float32) * v_scale[..., None, :]
        if v_mean is not None:
            v_eff = v_eff + v_mean[..., None, :]
        v_eff = v_eff.astype(jnp.bfloat16)
    else:
        v_eff = v.astype(jnp.bfloat16)

    if smooth_k:
        km = fwd_res.get("km")
        if km is None:
            km = jnp.mean(k.astype(jnp.float32), axis=-2)
    else:
        km = None
    have_k_res = fwd_res.get("k_i8") is not None
    if interpret:
        k_sm = k.astype(jnp.float32)
        if smooth_k:
            k_sm = k_sm - km[..., None, :]
        q_i8, q_scale = quant_mod.quant_int8(
            q, granularity="per_token", scale_fold=sm_scale * LOG2E
        )
        if have_k_res:
            k_i8, k_scale = fwd_res["k_i8"], fwd_res["k_scale"]
        else:
            k_i8, k_scale = quant_mod.quant_int8_block_scales(
                k_sm, group=scale_group
            )
        k_sm = k_sm.astype(jnp.bfloat16)
    else:
        q_i8, q_scale = quant_pallas.quant_q_per_token(
            q, scale_fold=sm_scale * LOG2E
        )
        if have_k_res:
            k_i8, k_scale = fwd_res["k_i8"], fwd_res["k_scale"]
        else:
            k_i8, k_scale = quant_pallas.quant_k_chunked(
                k, km, group=scale_group
            )
        k_sm = k.astype(jnp.float32)
        if smooth_k:
            k_sm = k_sm - km[..., None, :]
        k_sm = k_sm.astype(jnp.bfloat16)

    if o is not None and fwd_res.get("lse2") is not None:
        # the forward's raw base-2 LSE rode the residuals — no
        # inversion einsum needed
        lse2 = fwd_res["lse2"]
    elif o is not None and lse_nat is not None:
        # invert the public LSE back to the kernel's raw base-2 form:
        # lse_nat = lse2/log2e + (q.km)*sm_scale  (core.py smooth_k corr)
        if smooth_k:
            km_q = jnp.repeat(km, rep, axis=1) if rep > 1 else km
            corr = jnp.einsum(
                "bhqd,bhd->bhq", q.astype(jnp.float32), km_q
            ) * sm_scale
            lse2 = (lse_nat - corr) * LOG2E
        else:
            lse2 = lse_nat * LOG2E
    else:
        # recompute (o, lse2) with the SAME orientation and configs the
        # real forward dispatches (core._entry): at d <= 128 that is the
        # transposed (vt) kernel — the normal-orientation recompute at
        # the vt path's narrow 256-wide quant groups was the other half
        # of the r4 training regression.  chunk width == the K-quant
        # group, exactly as the forward ran, so lse2 is bit-consistent
        # with the kernels' recomputed l2.
        fbq, fbk, fsub, _ = attention_pallas.default_config(
            sq, sk, d, is_causal, vt=use_vt
        )
        fck = scale_group
        if sq % fbq or sk % fbk or (fbk % fck and sk > fbk):
            # the unpadded shape doesn't tile the forward config; decline
            # gracefully (the caller falls back) instead of assert-crashing
            return None
        if use_vt:
            o, lse2 = attention_pallas.sage_attention_fused(
                jnp.swapaxes(q_i8, 2, 3), q_scale, k_i8, k_scale,
                jnp.swapaxes(v_eff, 2, 3),
                vt=True, is_causal=is_causal, pv_dtype="bf16",
                return_lse=True, block_q=fbq, block_k=fbk, sub_q=fsub,
                chunk_k=fck, window=window, interpret=interpret,
            )
        else:
            o, lse2 = attention_pallas.sage_attention_fused(
                q_i8, q_scale, k_i8, k_scale, v_eff,
                is_causal=is_causal, pv_dtype="bf16", return_lse=True,
                block_q=fbq, block_k=fbk, sub_q=fsub, chunk_k=fck,
                window=window, interpret=interpret,
            )
    grads = sage_attention_bwd(
        q_i8, q_scale, k_i8, k_scale,
        k_sm, q.astype(jnp.bfloat16),
        v_eff, o, lse2, do, dlse,
        attn_bias,
        is_causal=is_causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, chunk_k=chunk_k,
        scale_group=scale_group, window=window,
        need_dbias=need_dbias, interpret=interpret,
    )
    if need_dbias:
        dq, dk, dv, dbias = grads
    else:
        dq, dk, dv = grads
        dbias = None
    if dlse is not None and smooth_k:
        # the smooth-k LSE correction term (q . km * sm_scale) contributes
        # dQ += dlse * km * sm_scale outside the kernels (the km pathway
        # through K cancels exactly in the lse identity)
        km_q = jnp.repeat(km, rep, axis=1) if rep > 1 else km
        dq = dq + dlse[..., None].astype(jnp.float32) * (
            km_q[:, :, None, :] * sm_scale
        )
    out = (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
    )
    if need_dbias:
        return out + (dbias.astype(attn_bias.dtype),)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_causal", "sm_scale", "block_q", "block_k", "chunk_k",
        "scale_group", "window", "need_dbias", "interpret",
    ),
)
def sage_attention_bwd(
    q_i8, q_scale, k_i8, k_scale, k_bf, q_bf, v_bf, o, lse2, do,
    dlse=None,
    attn_bias=None,
    *,
    is_causal: bool,
    sm_scale: float,
    block_q: int = 512,
    block_k: int = 1024,
    chunk_k: int | None = None,
    scale_group: int | None = None,
    window: int | None = None,
    need_dbias: bool = False,
    interpret: bool = False,
):
    """Fused backward: returns (dq, dk, dv) in f32.

    Inputs are the forward's quantized operands plus the saved bf16
    tensors: q_i8/q_scale (sm_scale*log2e folded), k_i8/k_scale
    (one scale per ``scale_group`` columns == the FORWARD's quant group), k_bf (smoothed or
    raw K, bf16), q_bf (raw Q), v_bf (raw V), o (forward output), lse2
    (raw base-2 LSE from the kernel), do (output cotangent).  All
    sequence dims must already be padded to block multiples.  GQA is
    native: K/V arrive at h_kv heads and dK/dV return at h_kv heads —
    the dkv grid folds the query-head group into its 4th axis and
    group-sums in scratch.
    """
    b, h, sq, d = q_i8.shape
    hkv, sk = k_i8.shape[1], k_i8.shape[2]
    assert h % hkv == 0, (h, hkv)
    rep = h // hkv
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    assert sq % block_q == 0 and sk % block_k == 0
    n_q, n_kv = sq // block_q, sk // block_k
    if chunk_k is None:
        chunk_k = block_k
    chunk_k = min(chunk_k, block_k)
    assert block_k % chunk_k == 0
    n_chunks = block_k // chunk_k
    if scale_group is None:
        scale_group = chunk_k
    # one scale per chunk (group % chunk == 0) or per-segment dequant
    # inside the chunk (chunk % group == 0) — see _dequant_l2
    assert (
        scale_group % chunk_k == 0 or chunk_k % scale_group == 0
    ), (scale_group, chunk_k)
    n_groups_total = -(-sk // scale_group)
    assert k_scale.shape[-1] == n_groups_total, (
        k_scale.shape, n_groups_total
    )

    # D = rowsum(dO * O) (natural units); an LSE cotangent enters the
    # kernels as dS = P * (dP - (D - dlse)) — pure input adjustment
    dvec = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )[..., None]  # [b,h,sq,1]
    if dlse is not None:
        dvec = dvec - dlse[..., None].astype(jnp.float32)
    lse_in = lse2[..., None] if lse2.ndim == 3 else lse2
    qs_in = q_scale.astype(jnp.float32)[..., None]
    ks_in = k_scale.astype(jnp.float32)[:, :, None, :]
    do_bf = do.astype(jnp.bfloat16)

    has_bias = attn_bias is not None
    if has_bias:
        assert attn_bias.shape == (b, h, sq, sk), (
            "fused bias backward requires a per-head full-shape bias "
            f"(got {attn_bias.shape}); broadcast forms fall back"
        )
        assert window is None, "bias + window falls back upstream"
    if need_dbias:
        assert has_bias

    # transposed accumulation at d <= 64 (the forward's vt rescue applied
    # to the backward): the dQ/dK/dV accumulation matmuls' 64 output
    # lanes waste half the MXU; accumulating dQ^T/dK^T/dV^T puts the
    # block axis on the lanes and one in-kernel transpose per block
    # epilogue restores the public layout.  $SAGE_BWD_VT=0 for A/B.
    import os as _os

    vt_out = d <= 64 and _os.environ.get("SAGE_BWD_VT", "1") != "0"

    # dq fold grid (the forward's causal triangle packing): q rows f and
    # n_q-1-f share one grid row of n_kv+1 all-live steps.  Needs the
    # row's last-kv formula f // r to be exact (block_k a multiple of
    # block_q) and an even pairing.
    fold_r = None
    if (
        is_causal and window is None and n_q >= 2 and n_q % 2 == 0
        and not need_dbias  # dS output needs a step for EVERY block
        and block_k % block_q == 0
        and n_q % (block_k // block_q) == 0
        # the step-count identity f//r + (n_q-1-f)//r == n_kv - 1 holds
        # only for a complete triangle (sq == sk); cross-length causal
        # shapes would leave complement rows' epilogues unfired
        and n_q == n_kv * (block_k // block_q)
    ):
        fold_r = block_k // block_q

    # window band grids: both backward kernels shrink their inner axis
    # to the blocks the window can reach, sliding with the outer block
    # (the backward analogue of the forward's band grid)
    band_dq = band_kv = None
    if is_causal and window is not None:
        nl = min(n_kv, (block_q + window - 2) // block_k + 2)
        if nl < n_kv:
            band_dq = nl
        nlq = min(n_q, (block_k + window - 2) // block_q + 2)
        if nlq < n_q:
            band_kv = nlq

    def _dec_dq(iq, ik):
        if fold_r is not None:
            c1m1 = iq // fold_r
            first = ik <= c1m1
            return (
                jnp.where(first, iq, n_q - 1 - iq),
                jnp.where(first, ik, ik - c1m1 - 1),
            )
        # band: offset by the row's first in-window kv block (clamped to
        # the last block, mirroring the kernel's decode); clamp the DMA
        # in range (overshoot steps fail the kernel's should_run)
        lo = jnp.minimum(
            jnp.maximum((iq * block_q - (window - 1)) // block_k, 0),
            n_kv - 1,
        )
        return iq, jnp.minimum(lo + ik, n_kv - 1)

    def dqmap(f4):
        if fold_r is None and band_dq is None:
            return f4
        return lambda ib, ih, iq, ik: f4(ib, ih, *_dec_dq(iq, ik))

    qm = lambda ib, ih, iq, ik: (ib, ih, iq, 0)
    # dkv grid axis 3 enumerates (group member, q block): t -> q head
    # ih*rep + t // n_q, q block t % n_q (GQA group-sum in scratch)
    if is_causal:
        def km_dq(ib, ih, iq, ik):
            hi = jnp.minimum(
                ik, (iq * block_q + block_q - 1) // block_k
            )
            if window is None:
                return (ib, ih // rep, hi, 0)
            lo = jnp.minimum(
                jnp.maximum((iq * block_q - (window - 1)) // block_k, 0),
                n_kv - 1,
            )
            return (ib, ih // rep, jnp.maximum(hi, lo), 0)

        def qm_dkv(ib, ih, ik, t):
            # clamp: with sk > sq the diagonal start exceeds the last q
            # block; the remapped DMA must stay in range (compute for
            # those steps is skipped by should_run on the raw q index)
            lo = jnp.minimum(
                jnp.maximum(t % n_q, (ik * block_k) // block_q), n_q - 1
            )
            if window is None:
                return (ib, ih * rep + t // n_q, lo, 0)
            hi = jnp.minimum(
                (ik * block_k + block_k - 1 + window - 1) // block_q,
                n_q - 1,
            )
            return (ib, ih * rep + t // n_q, jnp.minimum(lo, hi), 0)
    else:
        def km_dq(ib, ih, iq, ik):
            return (ib, ih // rep, ik, 0)

        def qm_dkv(ib, ih, ik, t):
            return (ib, ih * rep + t // n_q, t % n_q, 0)

    # ---- dq ----
    if fold_r is not None:
        dq_grid = (b, h, n_q // 2, n_kv + 1)
    elif band_dq is not None:
        dq_grid = (b, h, n_q, band_dq)
    else:
        dq_grid = (b, h, n_q, n_kv)
    dq_in_specs = [
        pl.BlockSpec((1, 1, block_q, d), dqmap(qm)),
        pl.BlockSpec((1, 1, block_q, 1), dqmap(qm)),
        pl.BlockSpec((1, 1, block_k, d), dqmap(km_dq)),
        pl.BlockSpec((1, 1, 1, n_groups_total),
                     lambda ib, ih, iq, ik: (ib, ih // rep, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, block_k, d), dqmap(km_dq)),
        pl.BlockSpec((1, 1, block_k, d), dqmap(km_dq)),
        pl.BlockSpec((1, 1, block_q, d), dqmap(qm)),
        pl.BlockSpec((1, 1, block_q, 1), dqmap(qm)),
        pl.BlockSpec((1, 1, block_q, 1), dqmap(qm)),
    ]
    dq_inputs = [q_i8, qs_in, k_i8, ks_in, k_bf, v_bf, do_bf, lse_in,
                 dvec]
    if has_bias:
        # full-shape per-head bias block; kv index clamps with K's map
        # so above-diagonal steps repeat the previous DMA
        def biasm_dq(ib, ih, iq, ik):
            kk = km_dq(ib, ih, iq, ik)
            return (ib, ih, iq, kk[2])
        dq_in_specs.append(
            pl.BlockSpec((1, 1, block_q, block_k), dqmap(biasm_dq))
        )
        dq_inputs.append(attn_bias)
    dq_out_specs = [pl.BlockSpec((1, 1, block_q, d), dqmap(qm))]
    dq_out_shape = [jax.ShapeDtypeStruct((b, h, sq, d), jnp.float32)]
    if need_dbias:
        # plain rectangular grid (fold/band disabled above): every
        # (q, kv) block gets exactly one step and one write
        dq_out_specs.append(
            pl.BlockSpec((1, 1, block_q, block_k),
                         lambda ib, ih, iq, ik: (ib, ih, iq, ik))
        )
        dq_out_shape.append(
            jax.ShapeDtypeStruct((b, h, sq, sk), attn_bias.dtype)
        )
    dq_res = pl.pallas_call(
        functools.partial(
            _dq_kernel, causal=is_causal, n_kv=n_kv, block_q=block_q,
            block_k=block_k, sm_scale=sm_scale, n_chunks=n_chunks,
            chunk_k=chunk_k, scale_group=scale_group, window=window,
            fold_r=fold_r, n_q=n_q, band_kv_grid=band_dq is not None,
            vt_out=vt_out, has_bias=has_bias, emit_dbias=need_dbias,
        ),
        grid=dq_grid,
        in_specs=dq_in_specs,
        out_specs=dq_out_specs if need_dbias else dq_out_specs[0],
        out_shape=dq_out_shape if need_dbias else dq_out_shape[0],
        scratch_shapes=[
            pltpu.VMEM(
                (d, block_q) if vt_out else (block_q, d), jnp.float32
            )
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3 + ("arbitrary",),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(*dq_inputs)
    if need_dbias:
        dq, dbias = dq_res
    else:
        dq, dbias = dq_res, None

    # ---- dk, dv ----
    kvm = lambda ib, ih, ik, iq: (ib, ih, ik, 0)

    def dkvmap(f4):
        # band grid (window): axis 3 step t -> (member, q block within
        # the window's reach of kv block ik), re-encoded as the t the
        # plain map expects; the clamp keeps overshoot DMAs in range
        # (the kernel's should_run skips their compute)
        if band_kv is None:
            return f4
        def g(ib, ih, ik, t):
            member = t // band_kv
            qe = (ik * block_k) // block_q + t % band_kv
            return f4(ib, ih, ik,
                      member * n_q + jnp.minimum(qe, n_q - 1))
        return g

    dkv_in_specs = [
        pl.BlockSpec((1, 1, block_k, d), kvm),
        pl.BlockSpec((1, 1, 1, n_groups_total),
                     lambda ib, ih, ik, t: (ib, ih, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, block_q, d), dkvmap(qm_dkv)),
        pl.BlockSpec((1, 1, block_q, 1), dkvmap(qm_dkv)),
        pl.BlockSpec((1, 1, block_q, d), dkvmap(qm_dkv)),
        pl.BlockSpec((1, 1, block_k, d), kvm),
        pl.BlockSpec((1, 1, block_q, d), dkvmap(qm_dkv)),
        pl.BlockSpec((1, 1, block_q, 1), dkvmap(qm_dkv)),
        pl.BlockSpec((1, 1, block_q, 1), dkvmap(qm_dkv)),
    ]
    dkv_inputs = [k_i8, ks_in, q_i8, qs_in, q_bf, v_bf, do_bf, lse_in,
                  dvec]
    if has_bias:
        # PRE-TRANSPOSED bias [b, h, sk, sq] (one XLA pass); the q-head
        # and clamped q-block come from qm_dkv's own map
        def biasm_dkv(ib, ih, ik, t):
            qq = qm_dkv(ib, ih, ik, t)
            return (ib, qq[1], ik, qq[2])
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, block_k, block_q), dkvmap(biasm_dkv))
        )
        dkv_inputs.append(jnp.swapaxes(attn_bias, 2, 3))
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, causal=is_causal, n_q=n_q, block_q=block_q,
            block_k=block_k, sm_scale=sm_scale, n_chunks=n_chunks,
            chunk_k=chunk_k, scale_group=scale_group, rep=rep,
            window=window, band_q=band_kv, vt_out=vt_out,
            has_bias=has_bias,
        ),
        grid=(b, hkv, n_kv, rep * (band_kv or n_q)),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), kvm),
            pl.BlockSpec((1, 1, block_k, d), kvm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, sk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, sk, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (d, block_k) if vt_out else (block_k, d), jnp.float32
            ),
            pltpu.VMEM(
                (d, block_k) if vt_out else (block_k, d), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3 + ("arbitrary",),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(*dkv_inputs)
    if need_dbias:
        return dq, dk, dv, dbias
    return dq, dk, dv
