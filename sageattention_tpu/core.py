"""Public API & dispatch (reference: sageattention/core.py).

``sageattn(q, k, v, ...)`` is a drop-in scaled-dot-product-attention
replacement (reference: core.py:80-158).  Where the reference dispatches on
GPU SM arch to one of four compiled backends, here there is a single Pallas
kernel family plus an XLA fallback:

* ``impl="pallas"`` — the fused TPU kernel (ops/attention_pallas.py).
  Bool masks AND additive float biases both ride in-kernel.
* ``impl="xla"``    — unfused jnp ops (materializes scores); used for CPU
  execution and as a cross-check.
* ``impl="auto"``   — pallas on TPU (interpret-mode pallas on CPU).

All entry points accept HND ([b, h, s, d]) or NHD ([b, s, h, d]) layouts
(reference: core.py tensor_layout), GQA (h_q a multiple of h_kv), causal
masking, and ``return_lse`` (natural-log logsumexp, the ring-attention merge
contract, reference: core.py:122-124).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

from sageattention_tpu import quant as quant_mod
from sageattention_tpu.ops import attention_pallas, quant_pallas, reference

LOG2E = 1.4426950408889634

# In-kernel K quantization (attention_pallas k_inkernel) is implemented
# and tested but measured op-total-NEUTRAL at 4k-8k (the quant lands on
# the kernel's q_idx==0 critical path instead of overlapping) and pushes
# 16k past the VMEM budget — the K prologue stays the production default.
_K_INKERNEL = False

# vt consumes NORMAL-layout Q/V by default (transposes ride the MXU
# dimension_numbers, killing the XLA Q^T/V^T relayout passes — the r4
# hd64 op-total gap); $SAGE_VT_NATIVE=0 restores the pre-transposed
# input form for A/B measurement.
import os as _os

_VT_NATIVE = _os.environ.get("SAGE_VT_NATIVE", "1") != "0"
# vt output in normal layout via in-kernel epilogue transposes (kills
# the XLA O^T relayout pass too); default off until measured on chip —
# $SAGE_VT_O=1 enables.
_VT_O_NORMAL = _os.environ.get("SAGE_VT_O", "0") == "1"

Layout = Literal["HND", "NHD"]


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _to_hnd(x: jax.Array, layout: Layout) -> jax.Array:
    if layout == "HND":
        return x
    if layout == "NHD":
        return jnp.swapaxes(x, 1, 2)
    raise ValueError(f"tensor_layout must be 'HND' or 'NHD', got {layout!r}")


def _from_hnd(x: jax.Array, layout: Layout) -> jax.Array:
    return x if layout == "HND" else jnp.swapaxes(x, 1, 2)


def _pad_head_dim(d: int) -> int:
    """Pad head_dim to a TPU-friendly size (reference pads to 64/128,
    core.py:772-786; TPU lanes are 128-wide, so 64 / multiples of 128)."""
    if d <= 64:
        return 64
    return -(-d // 128) * 128


def _pad_axis(x: jax.Array, axis: int, to: int) -> jax.Array:
    pad = to - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_causal",
        "sm_scale",
        "qk_quant_gran",
        "pv_dtype",
        "smooth_k",
        "smooth_q",
        "smooth_v",
        "return_lse",
        "block_q",
        "block_k",
        "sub_q",
        "chunk_k",
        "diag_chunk_k",
        "impl",
        "qk_bits",
        "window",
        "want_residuals",
    ),
)
def _sageattn_hnd(
    q,
    k,
    v,
    q_segment_ids,
    kv_segment_ids,
    q_positions,
    kv_positions,
    attn_bias,
    attn_mask,
    q_kv_lo=None,
    q_kv_hi=None,
    *,
    is_causal: bool,
    sm_scale: float | None,
    qk_quant_gran: str,
    pv_dtype: str,
    smooth_k: bool,
    smooth_v: bool,
    return_lse: bool,
    smooth_q: bool = False,
    block_q: int,
    block_k: int,
    impl: str,
    qk_bits: int = 8,
    sub_q: int = 128,
    chunk_k: int | None = None,
    diag_chunk_k: int | None = None,
    window: int | None = None,
    want_residuals: bool = False,
):
    """Quantize-then-attend pipeline on HND tensors (the call sequence of
    reference core.py:655-905, collapsed to quant(Q,K,V) + one fused kernel).

    With ``want_residuals`` (static) the return value becomes
    ``(out, residuals)`` where residuals is a dict of the quantized
    operands the fused backward can reuse (k_i8/k_scale/km,
    v_q/v_scale/v_mean, raw lse2) — filled on the pallas int8 path,
    empty on paths the fused backward declines anyway.  It must be a
    jit OUTPUT (not a mutated argument): this function is jit-wrapped,
    so an argument dict would be unflattened into a copy and caller
    mutations lost."""
    residual_sink = {} if want_residuals else None

    def _ret(out):
        return (out, residual_sink) if want_residuals else out
    out_dtype = q.dtype
    b, hq, sq, d_og = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    if sm_scale is None:
        sm_scale = d_og**-0.5

    # segment ids / positions only mean anything in pairs; a lone side
    # would either crash deep in the padding code or be silently ignored
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError(
            "q_segment_ids and kv_segment_ids must be passed together"
        )
    if (q_positions is None) != (kv_positions is None):
        raise ValueError(
            "q_positions and kv_positions must be passed together"
        )

    if attn_mask is not None and attn_mask.dtype != jnp.bool_:
        # float masks are additive biases (the reference accepts both on
        # its triton path, reference: core.py:306-316)
        attn_bias = attn_mask if attn_bias is None else attn_bias + attn_mask
        attn_mask = None
    if attn_mask is not None:
        # normalize to [b, hm, sq, sk] (the reference broadcast-expands
        # bool masks the same way, reference: core.py:306-316)
        if attn_mask.ndim == 2:
            attn_mask = attn_mask[None, None]
        elif attn_mask.ndim == 3:
            attn_mask = attn_mask[:, None]
        if attn_mask.shape[0] == 1 and b > 1:
            attn_mask = jnp.broadcast_to(
                attn_mask, (b,) + attn_mask.shape[1:]
            )
        if attn_mask.shape[1] not in (1, hq):
            raise ValueError(
                f"attn_mask head dim {attn_mask.shape[1]} must be 1 or {hq}"
            )
        if attn_mask.shape[-2:] != (sq, sk):
            # broadcast size-1 query/key dims (torch-style (B,1,1,S)
            # key-padding masks) — lazy under jit, no materialization;
            # anything else is a real shape error
            if all(
                ms in (1, full) for ms, full in
                zip(attn_mask.shape[-2:], (sq, sk))
            ):
                attn_mask = jnp.broadcast_to(
                    attn_mask, attn_mask.shape[:-2] + (sq, sk)
                )
            else:
                raise ValueError(
                    f"attn_mask trailing dims {attn_mask.shape[-2:]} must "
                    f"be ({sq}, {sk}) or broadcastable (size 1)"
                )
    if attn_bias is not None:
        # normalize additive biases to [b, hb, sq, sk] exactly like bool
        # masks (the reference broadcast-expands both forms the same way,
        # reference: core.py:306-316)
        if attn_bias.ndim == 2:
            attn_bias = attn_bias[None, None]
        elif attn_bias.ndim == 3:
            attn_bias = attn_bias[:, None]
        if attn_bias.shape[0] == 1 and b > 1:
            attn_bias = jnp.broadcast_to(
                attn_bias, (b,) + attn_bias.shape[1:]
            )
        if attn_bias.shape[1] not in (1, hq):
            raise ValueError(
                f"attn_bias head dim {attn_bias.shape[1]} must be 1 or {hq}"
            )
        if attn_bias.shape[-2:] != (sq, sk):
            if all(
                ms in (1, full) for ms, full in
                zip(attn_bias.shape[-2:], (sq, sk))
            ):
                attn_bias = jnp.broadcast_to(
                    attn_bias, attn_bias.shape[:-2] + (sq, sk)
                )
            else:
                raise ValueError(
                    f"attn_bias trailing dims {attn_bias.shape[-2:]} must "
                    f"be ({sq}, {sk}) or broadcastable (size 1)"
                )
    if impl == "auto":
        # bool masks AND additive float biases both run in-kernel on the
        # Pallas path (the bias joins the dequantized base-2 logits
        # before the max, like the reference's fused triton mask add,
        # attn_qk_int8_per_thread.py:49-56)
        impl = "pallas"

    # --- Q/K quantization (+ K smoothing) ------------------------------
    # "auto" is the TPU-recommended config: per-token Q scales + one K
    # scale per kernel KV *chunk* (SMEM scalar -> single-FMA dequant in
    # the kernel).  The reference ships per-GPU recommended configs the
    # same way (reference: bench/README.md:22-27).
    if chunk_k is None:
        chunk_k = attention_pallas.effective_chunk_k(block_k)
    # ONE-READ fused K prologue: mean + smooth-subtract + per-chunk quant
    # on a VMEM-resident slab (eliminates the separate XLA k.mean HBM
    # pass; reference fuses the same chain, csrc/fused/fused.cu:594-682)
    k_fused = (
        impl == "pallas"
        and qk_quant_gran == "auto"
        and quant_pallas.k_fused_eligible(
            k.shape[-2], k.shape[-1], chunk_k
        )
    )
    if k_fused:
        k_i8_f, k_scale_f, km = quant_pallas.quant_k_fused_mean(
            k, group=chunk_k, bits=qk_bits, smooth=smooth_k,
            interpret=_on_cpu(),
        )
    else:
        km = (
            jnp.mean(k.astype(jnp.float32), axis=-2) if smooth_k else None
        )
    # smooth_q (SageAttention2's Q-mean smoothing): quantize q - qm and add
    # the per-column correction qm . k_smoothed back inside the kernel
    # (q . k = (q-qm).(k-km) + qm.(k-km) + row-constants dropped by softmax;
    # the reference's v2 outlier smoothing, PAPERS.md arXiv 2411.10958).
    if smooth_q:
        qm = jnp.mean(q.astype(jnp.float32), axis=-2)  # [b, hq, d]
        q_in = (q.astype(jnp.float32) - qm[..., None, :]).astype(q.dtype)
        k_c = k.astype(jnp.float32)
        if km is not None:
            k_c = k_c - km[..., None, :]
        if hq != hkv:
            # grouped einsum instead of repeating K across the query-head
            # group (which would materialize b*hq*sk*d fp32)
            qm_g = qm.reshape(b, hkv, hq // hkv, d_og)
            score_col_bias = (
                jnp.einsum("bhgd,bhsd->bhgs", qm_g, k_c)
                .reshape(b, hq, -1) * sm_scale * LOG2E
            )
        else:
            score_col_bias = (
                jnp.einsum("bhd,bhsd->bhs", qm, k_c) * sm_scale * LOG2E
            )
    else:
        q_in = q
        score_col_bias = None
    q_fold = None
    k_inkernel = _K_INKERNEL  # module-level note on why this is False
    if qk_quant_gran == "auto":
        if impl == "pallas":
            # Q quantizes INSIDE the attention kernel (bit-identical to
            # the quant_q_per_token prologue; zero extra HBM traffic —
            # the kernel reads bf16 Q directly).  When the whole KV row
            # is one grid step, K does too (its block is resident across
            # q blocks, so a q_idx==0 scratch quant replaces the whole
            # K prologue) — the remaining prologue is then just the
            # K-mean reduction (+ V quant for int8 V).
            q_i8, q_scale = q_in, None  # unquantized; kernel quantizes
            q_fold = sm_scale * LOG2E
            if k_fused:
                k_i8, k_scale = k_i8_f, k_scale_f
            else:
                k_i8, k_scale = quant_pallas.quant_k_chunked(
                    k, km, group=chunk_k, bits=qk_bits, interpret=_on_cpu()
                )
            if residual_sink is not None and qk_bits == 8 and not smooth_q:
                # stash the UNPADDED quantized operands for the fused
                # backward (autodiff.py): the bwd then reuses the
                # forward's exact K codes/scales (whatever chunk the
                # tuned config picked) instead of re-quantizing, and the
                # saved lse2 is consistent with them by construction
                residual_sink["k_i8"] = k_i8
                residual_sink["k_scale"] = k_scale
                residual_sink["km"] = km
        else:
            if smooth_k:
                k_sm = k.astype(jnp.float32) - km[..., None, :]
            else:
                k_sm = k
            q_i8, q_scale = quant_mod.quant_int8(
                q_in,
                granularity="per_token",
                scale_fold=sm_scale * LOG2E,
                bits=qk_bits,
            )
            k_i8, k_scale = quant_mod.quant_int8_block_scales(
                k_sm, group=chunk_k, bits=qk_bits
            )
            # the oracle consumes per-row scales
            k_scale = jnp.repeat(k_scale, chunk_k, axis=-1)[..., :sk]
    else:
        q_i8, q_scale, k_i8, k_scale, km = quant_mod.quantize_qk(
            q_in,
            k,
            sm_scale=sm_scale,
            granularity=qk_quant_gran,
            smooth_k=smooth_k,
            bits=qk_bits,
        )
    if return_lse and smooth_k:
        # LSE correction: smoothing shifts every logit of row i by q_i.km
        # (reference: core.py:281-285, 795-799).
        lse_corr = jnp.einsum(
            "bhqd,bhd->bhq",
            q.astype(jnp.float32),
            jnp.repeat(km, hq // hkv, axis=1),
        )
    else:
        lse_corr = None

    # --- V quantization -------------------------------------------------
    v_mean = None
    v_scale = None
    if impl == "pallas":
        _quant_v = functools.partial(
            quant_pallas.quant_v_per_channel, interpret=_on_cpu()
        )
    else:
        _quant_v = quant_mod.per_channel_quant
    if pv_dtype == "int8":
        v_q, v_scale, v_mean = _quant_v(v, dtype=jnp.int8, smooth=smooth_v)
    elif pv_dtype in ("fp8", "fp8_e5m2"):
        # both reference fp8 coding variants (numeric_conversion.cuh:
        # 80-113 converts e4m3 AND e5m2); storage-only on this TPU
        # generation either way (no native fp8 MXU — see
        # sageattn_qk_int8_pv_fp8)
        fdt = jnp.float8_e4m3fn if pv_dtype == "fp8" else jnp.float8_e5m2
        v_q, v_scale, v_mean = _quant_v(v, dtype=fdt, smooth=smooth_v)
    elif pv_dtype == "bf16":
        if smooth_v:
            v_c, v_mean = quant_mod.sub_mean(v)
            v_q = v_c.astype(jnp.bfloat16)
        else:
            v_q = v.astype(jnp.bfloat16)
    else:
        raise ValueError(f"unknown pv_dtype {pv_dtype!r}")
    if (
        residual_sink is not None and impl == "pallas"
        and pv_dtype in ("int8", "fp8", "fp8_e5m2")
    ):
        # the fused backward's v_eff MUST be dequant(V_q) (the V the
        # forward actually multiplied); stashing the codes lets it skip
        # the re-quantization pass entirely
        residual_sink["v_q"] = v_q
        residual_sink["v_scale"] = v_scale
        residual_sink["v_mean"] = v_mean

    if window is not None and not is_causal:
        raise ValueError("window (sliding-window attention) requires "
                         "is_causal=True")
    if impl == "xla":
        if window is not None:
            band = reference.window_band_mask(sq, sk, window)
            attn_mask = (
                band if attn_mask is None
                else jnp.logical_and(attn_mask, band)
            )
        if attn_bias is not None:
            # Additive-bias path: full-precision (unquantized) XLA
            # attention — the bias joins pre-softmax, which the quantized
            # pipeline does not model (reference triton path attn_mask,
            # core.py:306-316).
            out = reference.attention_reference(
                q,
                k,
                v,
                is_causal=is_causal,
                sm_scale=sm_scale,
                q_segment_ids=q_segment_ids,
                kv_segment_ids=kv_segment_ids,
                q_positions=q_positions,
                kv_positions=kv_positions,
                attn_bias=attn_bias,
                attn_mask=attn_mask,
                return_lse=return_lse,
            )
            if return_lse:
                return _ret((out[0], out[1]))
            return _ret(out)
        out = reference.quantized_attention_reference(
            q_i8,
            q_scale,
            k_i8,
            k_scale,
            v_q,
            v_scale,
            v_mean,
            is_causal=is_causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            q_positions=q_positions,
            kv_positions=kv_positions,
            attn_mask=attn_mask,
            score_col_bias=score_col_bias,
            return_lse=return_lse,
            out_dtype=out_dtype,
        )
        if return_lse:
            o, lse2 = out
            lse = lse2 / LOG2E
            if lse_corr is not None:
                lse = lse + lse_corr * sm_scale
            return _ret((o, lse))
        return _ret(out)

    # --- padding to kernel tile multiples --------------------------------
    d_pad = _pad_head_dim(d_og)
    sq_pad = -(-sq // block_q) * block_q
    sk_pad = -(-sk // block_k) * block_k
    need_kv_mask = sk_pad != sk
    mask_i8 = None
    if attn_mask is not None:
        # pad rows/cols drop (0); fully-dead q rows produce 0 output and
        # -inf lse in-kernel, and pads are cropped below
        mask_i8 = _pad_axis(
            _pad_axis(attn_mask.astype(jnp.int8), 3, sk_pad), 2, sq_pad
        )
    bias_pad = None
    if attn_bias is not None:
        # zero-filled pads: pad KV columns are killed by the pad segment
        # ids / mask below (need_pad_ids fires whenever no mask covers
        # them), pad q rows are cropped
        bias_pad = _pad_axis(_pad_axis(attn_bias, 3, sk_pad), 2, sq_pad)
    # ragged-KV pad masking is deferred past the vt decision below: the
    # vt kernel takes it as per-q-row live ranges, the normal kernel as
    # matching pad segment ids
    need_pad_ids = (
        need_kv_mask and q_segment_ids is None and mask_i8 is None
    )
    if q_segment_ids is not None:
        q_segment_ids = _pad_axis(q_segment_ids + 2, 1, sq_pad)
        kv_segment_ids = _pad_axis(kv_segment_ids + 2, 1, sk_pad)
    if q_kv_lo is not None:
        # contiguous-range form of the same mask (varlen packing): pad q
        # rows get the empty range [0, 0) — fully dead, guarded and
        # cropped like any dead row
        q_kv_lo = _pad_axis(q_kv_lo.astype(jnp.int32), 1, sq_pad)
        q_kv_hi = _pad_axis(q_kv_hi.astype(jnp.int32), 1, sq_pad)
        # pads are 0 on kv / 0 on q; q-pad rows attend kv-pad rows (both
        # id 0) so their softmax is well-defined garbage that gets cropped;
        # real rows (ids >= 2) never match pads.

    if q_positions is not None:
        q_positions = _pad_axis(q_positions.astype(jnp.int32), 1, sq_pad)
        kv_pad = sk_pad - kv_positions.shape[1]
        if kv_pad:
            kv_positions = jnp.concatenate(
                [
                    kv_positions.astype(jnp.int32),
                    jnp.full((b, kv_pad), 2**30, jnp.int32),
                ],
                axis=1,
            )
    q_i8 = _pad_axis(_pad_axis(q_i8, 3, d_pad), 2, sq_pad)
    k_i8 = _pad_axis(_pad_axis(k_i8, 3, d_pad), 2, sk_pad)
    km_pad = (
        _pad_axis(km, 2, d_pad) if (k_inkernel and km is not None) else None
    )
    # head_dim <= 64: the TRANSPOSED kernel formulation (vt) is the MXU
    # rescue — the normal orientation runs the PV matmul at half
    # utilization (64 of 128 output lanes), while S^T = K.Q^T /
    # O^T = V^T.P^T puts sub_q = 128 on the PV lane axis (measured ~1.3x
    # kernel TOPS at 4k/hd64; tools/probe_mxu.py "transposed formulation").
    # Scope (attention_pallas.sage_attention_fused docstring): falls
    # back to the normal orientation + free-lane rowsum whenever an
    # explicit mask / user segments / positions / smooth-q bias /
    # per-row K scales ride in the kernel.  The internal ragged-KV pad
    # mask IS vt-supported (r4: per-q-row live ranges), so ragged hd64
    # shapes — CogVideoX's seq 17776 among them — keep the fast
    # orientation.
    k_scale_chunked = (
        k_scale is not None
        and k_scale.shape[-1] == -(-sk // chunk_k)
        and k_scale.shape[-1] != sk
    )
    use_vt = (
        d_pad <= 128
        and mask_i8 is None
        and attn_bias is None
        # USER segment ids keep the normal orientation UNLESS the
        # caller also supplied the contiguous-range form (varlen does);
        # the internal ragged-KV pad mask rides vt as a static bound or
        # ranges (need_pad_ids below)
        and (q_segment_ids is None or q_kv_lo is not None)
        and q_positions is None
        and score_col_bias is None
        and not k_inkernel
        and k_scale_chunked
    )
    kv_live = None
    if need_pad_ids:
        if (
            not is_causal and block_k >= sk
            # the kernel's own precondition (attention_pallas: the pad
            # region must fit inside ONE straddling chunk); a user
            # block_k override far above sk would otherwise trip the
            # kernel's assert — fall through to the id/range pad mask
            and sk_pad - sk < min(chunk_k, sk_pad)
        ):
            # single-KV-step grids: the pad mask is a STATIC bound — one
            # straddling chunk pays a compare, q-pad rows attend live
            # keys (their garbage rows are cropped below).  No id/range
            # arrays at all.
            kv_live = sk
        elif use_vt:
            # range form: real q rows see kv [0, sk); q pad rows see the
            # kv pad region [sk, sk_pad) so their softmax is
            # well-defined garbage that gets cropped below
            rows = jnp.arange(sq_pad, dtype=jnp.int32)[None, :]
            real = rows < sq
            q_segment_ids = jnp.broadcast_to(
                jnp.where(real, 0, sk), (b, sq_pad))          # kv lo
            kv_segment_ids = jnp.broadcast_to(
                jnp.where(real, sk, sk_pad), (b, sq_pad))     # kv hi
        else:
            # id form: real rows id 2, pads id 0 (pads attend pads)
            q_segment_ids = _pad_axis(
                jnp.full((b, sq), 2, jnp.int32), 1, sq_pad)
            kv_segment_ids = _pad_axis(
                jnp.full((b, sk), 2, jnp.int32), 1, sk_pad)
    if use_vt and q_kv_lo is not None:
        # vt consumes the caller's per-q-row live-KV ranges (varlen) in
        # the segment slots; the need_pad_ids branch above already wrote
        # its own ranges there, which this must NOT clobber with None
        q_segment_ids, kv_segment_ids = q_kv_lo, q_kv_hi
    if not use_vt and d_pad <= 64:
        # the configs above may have been tuned for the vt path (core
        # _entry's vt_hint mispredicts only on rare ragged-KV edge
        # shapes); the normal orientation keeps its own measured
        # sub-tile width and diagonal chunking
        sub_q = min(sub_q, 128)
        diag_chunk_k = None
    # Free-lane rowsum (normal orientation only): head_dim <= 64 pads V
    # to 128 lanes anyway, so a ones column at lane 64 makes the PV
    # matmul emit sum(p) and the kernel skips its VPU cross-lane sum
    # (reference rowsum-via-MMA: csrc/mma.cuh:683-721).
    rowsum_lane = 64 if (d_pad <= 64 and not use_vt) else None
    d_v = 128 if rowsum_lane is not None else d_pad
    v_q = _pad_axis(_pad_axis(v_q, 3, d_v), 2, sk_pad)
    if rowsum_lane is not None:
        one = jnp.ones((), v_q.dtype)
        v_q = v_q.at[:, :, :, rowsum_lane].set(one)
    if q_scale is not None:
        q_scale = _pad_axis(q_scale, 2, sq_pad)
    if k_scale is not None:
        if k_scale.shape[-1] == sk:
            k_scale = _pad_axis(k_scale, 2, sk_pad)
        else:
            # chunked K scales [b,hkv,ceil(sk/chunk_k)]: extend to the
            # padded chunk count (pad chunks are masked out via the
            # segment ids added above, so the value is irrelevant).
            k_scale = _pad_axis(k_scale, 2, -(-sk_pad // chunk_k))
    if v_scale is not None:
        v_scale = _pad_axis(v_scale, 2, d_v)
    if v_mean is not None:
        v_mean = _pad_axis(v_mean, 2, d_v)
    if score_col_bias is not None:
        score_col_bias = _pad_axis(score_col_bias, 2, sk_pad)
    vt_native = use_vt and _VT_NATIVE
    if use_vt and not vt_native:
        # legacy vt input form: Q and V transposed ([d, s] minor) via one
        # XLA relayout each.  The default (vt_native) instead feeds the
        # kernel NORMAL-layout Q/V and lets the MXU dimension_numbers
        # absorb the transposes — no relayout passes (the r4 hd64
        # op-total gap, ~335 us at 4k).  $SAGE_VT_NATIVE=0 restores this
        # form for A/B measurement.
        # No ones-row rowsum in either form: in the transposed
        # orientation l is a cross-SUBLANE reduction (cheap on the VPU,
        # unlike the normal orientation's cross-lane sum), and the +8
        # V^T pad rows break the int8 32-sublane tile — measured
        # 105.2 -> 77.3 TOPS on 4k-causal hd64 when tried (r4).
        q_i8 = jnp.swapaxes(q_i8, 2, 3)
        v_q = jnp.swapaxes(v_q, 2, 3)

    out = attention_pallas.sage_attention_fused(
        q_i8,
        q_scale,
        k_i8,
        k_scale,
        v_q,
        v_scale,
        v_mean,
        q_segment_ids,
        kv_segment_ids,
        q_positions,
        kv_positions,
        score_col_bias,
        mask_i8,
        km_pad,
        attn_bias=bias_pad,
        vt=use_vt,
        vt_native=vt_native,
        vt_o_normal=use_vt and _VT_O_NORMAL,
        kv_live=kv_live,
        k_inkernel=k_inkernel,
        is_causal=is_causal,
        pv_dtype=pv_dtype,
        # bits=4 quantizers clamp to +-7, so the kernel runs the QK dot on
        # the native int4 MXU path (~2x the int8 rate, measured)
        qk_int4=qk_bits == 4,
        q_fold=q_fold,
        window=window,
        return_lse=return_lse,
        block_q=block_q,
        block_k=block_k,
        sub_q=sub_q,
        chunk_k=chunk_k,
        diag_chunk_k=diag_chunk_k,
        rowsum_lane=rowsum_lane,
        out_dtype=out_dtype,
        interpret=_on_cpu(),
    )
    if return_lse:
        o, lse2 = out
    else:
        o, lse2 = out, None
    o = o[:, :, :sq, :d_og]
    if return_lse:
        if residual_sink is not None:
            # raw base-2 kernel LSE: the fused backward consumes this
            # form directly, skipping the smooth-k inversion einsum
            residual_sink["lse2"] = lse2[:, :, :sq]
        lse = lse2[:, :, :sq] / LOG2E
        if lse_corr is not None:
            lse = lse + lse_corr * sm_scale
        return o, lse
    return o


def _entry(
    q,
    k,
    v,
    tensor_layout: Layout = "HND",
    is_causal: bool = False,
    sm_scale: float | None = None,
    return_lse: bool = False,
    *,
    qk_quant_gran: str = "auto",
    pv_dtype: str = "int8",
    smooth_k: bool = True,
    smooth_q: bool = False,
    smooth_v: bool = False,
    q_segment_ids=None,
    kv_segment_ids=None,
    q_positions=None,
    kv_positions=None,
    attn_bias=None,
    attn_mask=None,
    block_q: int | None = None,
    block_k: int | None = None,
    impl: str = "auto",
    qk_bits: int = 8,
    window: int | None = None,
    residual_sink: dict | None = None,
):
    q = _to_hnd(q, tensor_layout)
    k = _to_hnd(k, tensor_layout)
    v = _to_hnd(v, tensor_layout)
    # any explicit mask form (bool OR additive float) rides in-kernel as
    # a [block_q, block_k] block — cap the KV block (default_config)
    masked = attn_mask is not None or attn_bias is not None
    # Predict whether _sageattn_hnd will take the transposed (vt) path —
    # its block-size winners differ a lot from the normal orientation's
    # (see default_config).  The prediction must be a SUBSET of the real
    # gate: a vt-tuned config on the normal kernel risks VMEM blowups
    # (sub_q 1024), so _sageattn_hnd clamps sub_q if it falls back.
    vt_hint = (
        attention_pallas.vt_eligible_head_dim(q.shape[-1])
        and attn_mask is None
        and q_segment_ids is None
        and q_positions is None
        and attn_bias is None
        and not smooth_q
        and qk_quant_gran == "auto"
        and impl in ("auto", "pallas")
        # ragged-KV padding is vt-supported since r4 (per-q-row live
        # ranges) — no 128-alignment condition
    )
    bq_auto, bk_auto, sub_q, chunk_k = attention_pallas.default_config(
        q.shape[2], k.shape[2], q.shape[-1], is_causal, masked=masked,
        vt=vt_hint, window=window,
    )
    diag_chunk_k = attention_pallas.default_diag_chunk(
        q.shape[2], k.shape[2], q.shape[-1], is_causal, masked=masked,
        vt=vt_hint, window=window,
    )
    if block_q is None:
        block_q = bq_auto
    if block_k is None:
        block_k = bk_auto
    chunk_k = min(chunk_k, block_k)
    sub_q = min(sub_q, block_q)
    out = _sageattn_hnd(
        q,
        k,
        v,
        q_segment_ids,
        kv_segment_ids,
        q_positions,
        kv_positions,
        attn_bias,
        attn_mask,
        is_causal=is_causal,
        sm_scale=sm_scale,
        qk_quant_gran=qk_quant_gran,
        pv_dtype=pv_dtype,
        smooth_k=smooth_k,
        smooth_q=smooth_q,
        smooth_v=smooth_v,
        return_lse=return_lse,
        block_q=block_q,
        block_k=block_k,
        impl=impl,
        qk_bits=qk_bits,
        sub_q=sub_q,
        chunk_k=chunk_k,
        diag_chunk_k=diag_chunk_k,
        window=window,
        residual_sink=residual_sink,
    )
    if return_lse:
        o, lse = out
        return _from_hnd(o, tensor_layout), lse
    return _from_hnd(out, tensor_layout)


def sageattn(
    q,
    k,
    v,
    tensor_layout: Layout = "HND",
    is_causal: bool = False,
    sm_scale: float | None = None,
    return_lse: bool = False,
    **kwargs,
):
    """Auto-dispatch entry point (reference: core.py:80-158 ``sageattn``).

    Drop-in replacement for scaled-dot-product attention.  On TPU this
    always selects the fused Pallas kernel with int8 QK^T (per-token Q
    scales + per-block K scales, with K mean-smoothing); there is no
    per-arch table.  The auto choice for P.V is **bf16** — the measured
    best end-to-end config on this hardware (op-total 175 vs 171 TOPS at
    4k/hd128 for int8 V, and strictly more accurate: no V quantization
    error) — playing the role of the reference's per-SM kernel pick.
    Pass ``pv_dtype="int8"``/``"fp8"`` (or call the explicit entry
    points) for the compressed-V variants when HBM traffic dominates.

    Differentiable w.r.t. q/k/v (quantized forward, exact recomputed
    backward — see ops/autodiff.py) whenever no segment/position/bias
    tensors are passed; the reference is forward-only.
    """
    kwargs.setdefault("pv_dtype", "bf16")
    tensor_args = ("q_segment_ids", "kv_segment_ids", "q_positions",
                   "kv_positions", "attn_bias", "attn_mask")
    if all(kwargs.get(a) is None for a in tensor_args):
        from sageattention_tpu.ops import autodiff

        kwargs = {k_: v_ for k_, v_ in kwargs.items() if v_ is not None}
        qh = _to_hnd(q, tensor_layout)
        kh = _to_hnd(k, tensor_layout)
        vh = _to_hnd(v, tensor_layout)
        out = autodiff.differentiable_sageattn(
            qh,
            kh,
            vh,
            is_causal=is_causal,
            sm_scale=sm_scale,
            return_lse=return_lse,
            **kwargs,
        )
        if return_lse:
            return _from_hnd(out[0], tensor_layout), out[1]
        return _from_hnd(out, tensor_layout)
    if (
        kwargs.get("attn_bias") is not None
        and all(kwargs.get(a) is None for a in tensor_args
                if a != "attn_bias")
        and (not hasattr(kwargs["attn_bias"], "dtype")
             or kwargs["attn_bias"].dtype != jnp.bool_)
    ):
        # bias-only: differentiable w.r.t. q/k/v AND the bias (trainable
        # relative-position biases; the reference is forward-only).
        # Backward is the exact reference VJP — O(s^2) memory, inherent
        # to a [b,h,sq,sk] bias cotangent.
        from sageattention_tpu.ops import autodiff

        bias = kwargs.pop("attn_bias")
        kwargs = {k_: v_ for k_, v_ in kwargs.items() if v_ is not None}
        qh = _to_hnd(q, tensor_layout)
        kh = _to_hnd(k, tensor_layout)
        vh = _to_hnd(v, tensor_layout)
        out = autodiff.differentiable_sageattn_bias(
            qh,
            kh,
            vh,
            bias,
            is_causal=is_causal,
            sm_scale=sm_scale,
            return_lse=return_lse,
            **kwargs,
        )
        if return_lse:
            return _from_hnd(out[0], tensor_layout), out[1]
        return _from_hnd(out, tensor_layout)
    return _entry(
        q,
        k,
        v,
        tensor_layout,
        is_causal,
        sm_scale,
        return_lse,
        **kwargs,
    )


def sageattn_qk_int8_pv_int8(q, k, v, tensor_layout="HND", is_causal=False,
                             sm_scale=None, return_lse=False, **kw):
    """INT8 QK^T + INT8 PV with per-channel V scales and two-level (int32 ->
    fp32) accumulation — the TPU-native analogue of the reference FP8 path
    ``sageattn_qk_int8_pv_fp8_cuda`` (reference: core.py:655-905)."""
    kw.setdefault("pv_dtype", "int8")
    return _entry(q, k, v, tensor_layout, is_causal, sm_scale, return_lse, **kw)


def sageattn_qk_int8_pv_bf16(q, k, v, tensor_layout="HND", is_causal=False,
                             sm_scale=None, return_lse=False, **kw):
    """INT8 QK^T + bf16 PV (fp32 accum) — the accuracy-fallback analogue of
    ``sageattn_qk_int8_pv_fp16_cuda/_triton`` (reference: core.py:160-360,
    479-653).  Supports smooth_v (reference: core.py:636-638)."""
    kw.setdefault("pv_dtype", "bf16")
    return _entry(q, k, v, tensor_layout, is_causal, sm_scale, return_lse, **kw)


def sageattn_qk_int8_pv_fp8(q, k, v, tensor_layout="HND", is_causal=False,
                            sm_scale=None, return_lse=False, **kw):
    """INT8 QK^T + FP8(e4m3) V *storage* (reference: core.py:655-905).

    On this TPU generation fp8 is storage compression only: the measured
    fp8 matmul rate equals bf16 (174 vs 178 TFLOPS roofline — no native
    fp8 MXU path), so V is stored e4m3 (halved HBM/VMEM traffic, same
    per-channel scale machinery) and upcast in-register for the P.V
    matmul.  Generations with a native fp8 MXU would pick it up through
    the same ``dot_general`` without API changes.

    Pass ``pv_dtype="fp8_e5m2"`` for the e5m2 coding (the reference
    converts both, csrc/numeric_conversion.cuh:80-113); e4m3's extra
    mantissa bit is the better trade under per-channel scaling, e5m2 is
    kept for format parity."""
    kw.setdefault("pv_dtype", "fp8")
    return _entry(q, k, v, tensor_layout, is_causal, sm_scale, return_lse, **kw)


def sageattn_varlen(
    q,
    k,
    v,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int | None = None,
    max_seqlen_k: int | None = None,
    is_causal: bool = False,
    sm_scale: float | None = None,
    return_lse: bool = False,
    *,
    smooth_k_mode: str = "global",
    **kwargs,
):
    """Ragged-batch attention over FlashAttention-style packed tensors
    (reference: core.py:362-477 ``sageattn_varlen``).

    q/k/v: [total_tokens, heads, head_dim]; cu_seqlens_*: [batch+1] int32
    cumulative sequence starts.  Internally this is segment-id masking in
    the fused kernel (the splash-attention idiom) rather than cu_seqlens
    pointer arithmetic; per-block segment ranges feed the kernel's
    liveness summary so cross-segment blocks are skipped (the band
    structure the reference gets from cu_seqlens extents).

    ``max_seqlen_q/k`` hints cap the kernel block sizes so the block grid
    tracks the segment granularity (better block skipping for many short
    segments).

    ``smooth_k_mode``: "global" matches the reference — ONE K mean over
    all packed tokens (reference: core.py:462 and its caveat comment);
    "per_segment" centers each sequence by its own K mean (exactly valid:
    rows only attend within their segment, so the subtracted constant is
    per-row) — strictly better quantization for heterogeneous batches.
    """
    if is_causal:
        # Causal varlen requires identical packing of q and k so absolute
        # positions order correctly within each segment.
        if q.shape[0] != k.shape[0]:
            raise ValueError("causal varlen requires matching q/k packing")
        if cu_seqlens_q.shape != cu_seqlens_k.shape:
            raise ValueError(
                "causal varlen requires cu_seqlens_q and cu_seqlens_k of "
                f"the same shape, got {cu_seqlens_q.shape} vs "
                f"{cu_seqlens_k.shape}"
            )
        import numpy as _np

        try:  # concrete cu_seqlens (the common case): check values
            cq, ck_ = _np.asarray(cu_seqlens_q), _np.asarray(cu_seqlens_k)
            if not _np.array_equal(cq, ck_):
                raise ValueError(
                    "causal varlen requires cu_seqlens_q == cu_seqlens_k "
                    "(mismatched packings would silently compute wrong "
                    "causal masks)"
                )
        except jax.errors.TracerArrayConversionError:
            pass  # traced: shape-checked above, values are the caller's
            # contract
    total_q, h, d = q.shape
    total_k = k.shape[0]
    positions_q = jnp.arange(total_q, dtype=jnp.int32)
    positions_k = jnp.arange(total_k, dtype=jnp.int32)
    seg_q = jnp.searchsorted(cu_seqlens_q, positions_q, side="right").astype(
        jnp.int32
    )
    seg_k = jnp.searchsorted(cu_seqlens_k, positions_k, side="right").astype(
        jnp.int32
    )
    qh = jnp.swapaxes(q, 0, 1)[None]  # [1, h, total_q, d]
    kh = jnp.swapaxes(k, 0, 1)[None]
    vh = jnp.swapaxes(v, 0, 1)[None]

    smooth_k = kwargs.pop("smooth_k", True)
    lse_corr_seg = None
    if smooth_k and smooth_k_mode == "per_segment":
        # center K by per-segment means; exact because attention never
        # crosses segments (the per-row constant drops in softmax).  The
        # pipeline then runs with smooth_k=False on pre-centered K.
        n_seg = cu_seqlens_k.shape[0]  # upper bound on segment count
        kf = k.astype(jnp.float32)  # [total_k, hkv, d]
        seg_sum = jax.ops.segment_sum(kf, seg_k, num_segments=n_seg + 1)
        counts = jax.ops.segment_sum(
            jnp.ones((total_k,), jnp.float32), seg_k, num_segments=n_seg + 1
        )
        km_seg = seg_sum / jnp.maximum(counts, 1.0)[:, None, None]
        km_rows = km_seg[seg_k]  # [total_k, hkv, d]
        kh = jnp.swapaxes(kf - km_rows, 0, 1)[None].astype(k.dtype)
        smooth_k = False
        if return_lse:
            # lse correction per row: q_i . km(segment of i) * sm_scale
            sm = sm_scale if sm_scale is not None else d**-0.5
            km_q_rows = km_seg[seg_q]  # [total_q, hkv, d]
            hkv = k.shape[1]
            km_q_rows = jnp.repeat(km_q_rows, h // hkv, axis=1)
            lse_corr_seg = (
                jnp.einsum(
                    "thd,thd->th", q.astype(jnp.float32), km_q_rows
                ).T[None]
                * sm
            )  # [1, h, total_q]
    elif smooth_k_mode not in ("global", "per_segment"):
        raise ValueError(f"unknown smooth_k_mode {smooth_k_mode!r}")

    # per-q-row live-KV ranges — the contiguous-range mask form that
    # lets hd64 varlen ride the transposed (vt) kernel
    kv_lo_rows = cu_seqlens_k[seg_q - 1].astype(jnp.int32)
    kv_hi_rows = cu_seqlens_k[seg_q].astype(jnp.int32)
    bq_auto, bk_auto, _, _ = attention_pallas.default_config(
        total_q, total_k, d, is_causal, vt=d <= 128
    )
    # max_seqlen hints: align the block grid with the segment granularity
    # so the liveness summary can skip cross-segment blocks
    if max_seqlen_k is not None:
        bk_auto = min(bk_auto, max(512, -(-int(max_seqlen_k) // 128) * 128))
    if max_seqlen_q is not None:
        bq_auto = min(bq_auto, max(256, -(-int(max_seqlen_q) // 128) * 128))
    hnd_kwargs = dict(
        qk_quant_gran=kwargs.pop("qk_quant_gran", "auto"),
        pv_dtype=kwargs.pop("pv_dtype", "int8"),
        smooth_v=kwargs.pop("smooth_v", False),
        block_q=kwargs.pop("block_q", None) or bq_auto,
        block_k=kwargs.pop("block_k", None) or bk_auto,
        impl=kwargs.pop("impl", "auto"),
        qk_bits=kwargs.pop("qk_bits", 8),
        smooth_q=kwargs.pop("smooth_q", False),
    )
    if kwargs:
        # silently dropping e.g. window=... would compute the wrong
        # attention pattern; fail BEFORE dispatching the attention
        raise TypeError(
            f"sageattn_varlen got unexpected kwargs {sorted(kwargs)}"
        )
    out = _sageattn_hnd(
        qh,
        kh,
        vh,
        seg_q[None],
        seg_k[None],
        None,
        None,
        None,
        None,
        q_kv_lo=kv_lo_rows[None],
        q_kv_hi=kv_hi_rows[None],
        is_causal=is_causal,
        sm_scale=sm_scale,
        smooth_k=smooth_k,
        return_lse=return_lse,
        **hnd_kwargs,
    )
    if return_lse:
        o, lse = out
        if lse_corr_seg is not None:
            lse = lse + lse_corr_seg
        return jnp.swapaxes(o[0], 0, 1), lse[0]
    return jnp.swapaxes(out[0], 0, 1)
