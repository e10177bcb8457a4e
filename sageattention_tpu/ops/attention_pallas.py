"""Fused SageAttention kernel for TPU (Pallas / Mosaic).

One parameterized kernel family replaces the reference's per-arch CUDA/HIP/
Triton kernel zoo (reference: csrc/qattn/qk_int_sv_f8_cuda_sm89.cuh:46-706,
qk_int_sv_f16_cuda_sm80.cu, triton/attn_qk_int8_*.py).  Static configuration
(head_dim, causal, PV dtype/accum policy, LSE, GQA group, segments) is
resolved at trace time; Mosaic targets every TPU generation, so there is no
arch dispatch matrix (reference: csrc/dispatch_utils.h).

Algorithm (the reference's fused form, SURVEY.md §3.2), mapped to TPU:

* grid = (batch, q_heads, q_blocks, kv_blocks); the kv dimension is the
  online-softmax reduction ("arbitrary"), the rest are parallel.  The Pallas
  grid pipeline double-buffers the K/V block DMAs automatically (the TPU
  analogue of cp.async group staging, reference: csrc/cp_async.cuh).
* Q.K^T is an int8 x int8 -> int32 ``dot_general`` on the MXU (the analogue
  of mma.cuh s8s8s32, reference: csrc/mma.cuh:329-427).
* Dequantization is an outer-product broadcast of **per-row** fp32 scales
  (q_scale has sm_scale*log2e folded in), so softmax runs in base 2 —
  exactly the reference's folded-dequant ``update_mdo`` online softmax
  (reference: csrc/qattn/attn_utils.cuh:353-458) minus the warp shuffles,
  which the VPU's native cross-lane reductions subsume.
* P.V runs in one of three policies (``pv_dtype``):
    - "int8": P is requantized in-register to int8 with the static scale
      127 (P in (0,1]); V is per-channel int8.  The int32 block product is
      rescaled and added to the fp32 long-term accumulator — the TPU-native
      analogue of the reference's FP8 PV with two-level accumulation
      ("fp32+fp32" inst_buf, reference: attn_utils.cuh:777-992) *and* of its
      S_FP8_OFFSET=8.807 exponent trick (2^8.807=448 maps P to full e4m3
      range; x127 maps P to full int8 range the same way,
      reference: attn_utils.cuh:30-32).  On TPU the fast low-bit MXU path
      is int8, which is why this (not fp8) is the default quantized PV.
    - "fp8": P -> float8_e4m3 (x448), V per-channel fp8; for TPU
      generations with native fp8 matmul.
    - "bf16": P in bf16, V in bf16, fp32 accumulation — the accuracy
      fallback (the analogue of qk_int8_sv_f16, reference:
      csrc/qattn/qk_int_sv_f16_cuda_sm80.cu).
* Causal block skip: KV blocks strictly above the diagonal are skipped
  (reference early-exit: sm89.cuh:225-229).
* Epilogue: 1/d normalization, fused per-channel v_scale multiply and
  v_mean add (reference: sm89.cuh:578-624), optional base-2 LSE store
  (reference: sm89.cuh:694-706).
* Varlen is expressed as segment-id masking (splash-attention idiom) rather
  than cu_seqlens pointer chasing (reference: triton/attn_qk_int8_block_
  varlen.py) — same capability, TPU-idiomatic form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NEG_INF = -jnp.inf
# Full-scale requantization factors for P in (0, 1] (folded into the exp2
# bias inside the kernel).
P_INT8_SCALE = 127.0
P_FP8_SCALE = 448.0
LOG2_P_INT8 = float(jnp.log2(P_INT8_SCALE))
LOG2_P_FP8 = float(jnp.log2(P_FP8_SCALE))
MIN_LANES = 128
# int32-domain mask value used on raw QK^T scores in the fast path; scaled
# by the (positive) dequant scale it stays hugely negative.
MASK_I32 = -(2**30)


def _kernel(
    q_ref,
    qs_ref,
    k_ref,
    ks_ref,
    v_ref,
    vs_ref,
    vm_ref,
    qseg_ref,
    kseg_ref,
    qpos_ref,
    kpos_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    causal: bool,
    pv_dtype: str,
    k_scale_blocked: bool,
    has_v_scale: bool,
    has_v_mean: bool,
    has_segments: bool,
    has_positions: bool,
    return_lse: bool,
    block_q: int,
    block_k: int,
    n_kv: int,
    out_dtype,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        # Run only blocks intersecting or below the diagonal
        # (reference early-exit: sm89.cuh:225-229).
        should_run = kv_idx * block_k <= q_idx * block_q + (block_q - 1)
    else:
        should_run = True

    @pl.when(should_run)
    def _body():
        q = q_ref[0, 0]  # [block_q, d] int8
        k = k_ref[0, 0]  # [block_k, d] int8
        s_i32 = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [block_q, block_k]
        qs = qs_ref[0, 0]  # [block_q, 1] f32 (sm_scale*log2e folded)

        # p is computed directly in the "xP_SCALE domain": the P
        # requantization factor (127 for int8 / 448 for fp8 / 1 for bf16)
        # is folded into the exp2 bias, so quantizing P costs only a
        # convert — the TPU formulation of the reference's S_FP8_OFFSET
        # exponent trick (reference: attn_utils.cuh:30-32, 353-458).
        # l is accumulated in the same domain; o = acc/l cancels it, and
        # the LSE epilogue subtracts log2(P_SCALE) once.
        if pv_dtype == "int8":
            log2_p_scale = LOG2_P_INT8
        elif pv_dtype == "fp8":
            log2_p_scale = LOG2_P_FP8
        else:
            log2_p_scale = 0.0

        mask = None
        if k_scale_blocked:
            # FAST PATH (the TPU-recommended config): one K scale per kernel
            # block, read from SMEM.  All masking happens in the int32
            # domain, the row max is an integer reduction (it commutes with
            # the positive per-row scale), and dequantization reaches the
            # VPU as a single fused multiply-subtract feeding exp2 — the hot
            # loop is convert+FMA+exp2+max+sum per score element.
            # whole row of per-block scales is resident in SMEM; pick this
            # block's scalar (kv_idx <= diagonal limit inside _body).
            ksc = ks_ref[0, 0, 0, kv_idx]
            rowscale = qs * ksc  # [block_q, 1]
            if has_segments:
                mask = qseg_ref[0] == kseg_ref[0]
                s_i32 = jnp.where(mask, s_i32, MASK_I32)
            if has_positions:
                # explicit-position causal masking (dynamic offsets: ring
                # attention KV rotation, packed caches)
                pmask = kpos_ref[0] <= qpos_ref[0]
                mask = pmask if mask is None else jnp.logical_and(mask, pmask)
                s_i32 = jnp.where(pmask, s_i32, MASK_I32)
            if causal:
                # Unconditional on computed tiles: a lax.cond guarding
                # diagonal-only tiles measured slower (Mosaic evaluates
                # both branches), unlike the reference's two-phase split
                # (triton/attn_qk_int8_per_block_causal.py:28-46).
                row = jax.lax.broadcasted_iota(jnp.int32, s_i32.shape, 0)
                col = jax.lax.broadcasted_iota(jnp.int32, s_i32.shape, 1)
                cm = (col + kv_idx * block_k) <= (row + q_idx * block_q)
                s_i32 = jnp.where(cm, s_i32, MASK_I32)
            imax = jnp.max(s_i32, axis=1)[:, None]  # int32 [block_q, 1]
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = imax.astype(jnp.float32) * rowscale
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            bias = m_next[:, :1] - log2_p_scale
            p = jnp.exp2(s_i32.astype(jnp.float32) * rowscale - bias)
        else:
            # Per-row K scales (reference-parity accuracy modes): one extra
            # broadcast multiply per element.
            ks = ks_ref[0, 0]  # [1, block_k] f32
            s = s_i32.astype(jnp.float32) * qs * ks
            if has_segments:
                mask = qseg_ref[0] == kseg_ref[0]
                s = jnp.where(mask, s, MASK_VALUE)
            if has_positions:
                pmask = kpos_ref[0] <= qpos_ref[0]
                mask = pmask if mask is None else jnp.logical_and(mask, pmask)
                s = jnp.where(pmask, s, MASK_VALUE)
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                cm = (col + kv_idx * block_k) <= (row + q_idx * block_q)
                s = jnp.where(cm, s, MASK_VALUE)
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            bias = m_next[:, :1] - log2_p_scale
            p = jnp.exp2(s - bias)  # values in [0, P_SCALE]

        if has_segments or has_positions:
            # A fully-masked tile would otherwise yield p == P_SCALE
            # everywhere (s - m == 0 when every entry is MASK_VALUE).
            p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]  # [block_k, d]
        if pv_dtype == "int8":
            # float->int convert truncates; +0.5 makes it round-half-up.
            # p <= 127.0 (+eps) so 127.5+eps still truncates into range.
            p_q = (p + 0.5).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_q,
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        elif pv_dtype == "fp8":
            p_q = p.astype(v.dtype)
            pv = jax.lax.dot_general(
                p_q,
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:  # bf16
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    if causal:
        last_kv = jnp.minimum(
            n_kv - 1, (q_idx * block_q + block_q - 1) // block_k
        )
    else:
        last_kv = n_kv - 1

    @pl.when(kv_idx == last_kv)
    def _epilogue():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o = acc_scr[...] * l_inv
        if has_v_scale:
            o = o * vs_ref[0, 0]  # [1, d]
        if has_v_mean:
            # sum(p)/l == 1 for any live row, so adding the mean back is
            # exact (smooth_v epilogue, reference: sm89.cuh:602-624);
            # dead (fully-masked) rows keep 0.
            o = o + jnp.where(l == 0.0, 0.0, 1.0) * vm_ref[0, 0]
        o_ref[0, 0] = o.astype(out_dtype)
        if return_lse:
            if pv_dtype == "int8":
                lse_off = LOG2_P_INT8
            elif pv_dtype == "fp8":
                lse_off = LOG2_P_FP8
            else:
                lse_off = 0.0
            lse_ref[0, 0] = (
                jnp.where(l == 0.0, NEG_INF, jnp.log2(jnp.maximum(l, 1e-45)))
                + m_scr[:, :1]
                - lse_off
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_causal",
        "pv_dtype",
        "return_lse",
        "block_q",
        "block_k",
        "out_dtype",
        "interpret",
    ),
)
def sage_attention_fused(
    q_i8: jax.Array,
    q_scale: jax.Array,
    k_i8: jax.Array,
    k_scale: jax.Array,
    v_q: jax.Array,
    v_scale: jax.Array | None = None,
    v_mean: jax.Array | None = None,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    q_positions: jax.Array | None = None,
    kv_positions: jax.Array | None = None,
    *,
    is_causal: bool = False,
    pv_dtype: str = "int8",
    return_lse: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Launch the fused kernel.

    Shapes (HND): q_i8 [b,hq,sq,d] int8; q_scale [b,hq,sq] f32 (sm_scale*
    log2e folded); k_i8 [b,hkv,sk,d] int8; k_scale [b,hkv,sk] f32;
    v_q [b,hkv,sk,d] (int8 / fp8 / bf16 per ``pv_dtype``); v_scale/v_mean
    [b,hkv,d] f32 or None; segment ids [b,sq]/[b,sk] int32 or None.
    sq, sk must be multiples of block_q / block_k (pad upstream; core.py
    handles padding + cropping like the reference launchers,
    reference: core.py:772-786,822-828).

    Returns o [b,hq,sq,d] (and base-2 LSE [b,hq,sq] fp32 if return_lse).
    """
    b, hq, sq, d = q_i8.shape
    hkv, sk = k_i8.shape[1], k_i8.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    group = hq // hkv
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)
    n_q, n_kv = sq // block_q, sk // block_k
    # k_scale layout: per-row vector [b, hkv, sk] (reference-parity modes)
    # or one scalar per kernel KV block [b, hkv, n_kv] (fast path).
    k_scale_blocked = k_scale.shape[-1] == n_kv and n_kv != sk
    if k_scale.shape[-1] not in (sk, n_kv):
        raise ValueError(
            f"k_scale last dim {k_scale.shape[-1]} must be kv_len {sk} "
            f"(per-row) or n_kv_blocks {n_kv} (per-block)"
        )

    has_v_scale = v_scale is not None
    has_v_mean = v_mean is not None
    has_segments = q_segment_ids is not None
    has_positions = q_positions is not None

    grid = (b, hq, n_q, n_kv)

    def qm(ib, ih, iq, ik):
        return (ib, ih, iq, 0)

    if is_causal:
        # Clamp the KV block index for steps above the diagonal: the index
        # map then repeats the previous block and the Pallas pipeline emits
        # no DMA for it (the compute is skipped by pl.when), making the
        # causal early-exit free in bandwidth as well as FLOPs
        # (reference early-exit: sm89.cuh:225-229).
        def _clamp(iq, ik):
            return jnp.minimum(ik, (iq * block_q + block_q - 1) // block_k)

        def km(ib, ih, iq, ik):
            return (ib, ih // group, _clamp(iq, ik), 0)

        def ksm(ib, ih, iq, ik):
            return (ib, ih // group, 0, _clamp(iq, ik))

        def ksm_blk(ib, ih, iq, ik):
            return (ib, ih // group, 0, 0)

        def kvsegm(ib, ih, iq, ik):
            return (ib, 0, _clamp(iq, ik))
    else:
        def km(ib, ih, iq, ik):
            return (ib, ih // group, ik, 0)

        def ksm(ib, ih, iq, ik):
            return (ib, ih // group, 0, ik)

        def ksm_blk(ib, ih, iq, ik):
            return (ib, ih // group, 0, 0)

        def kvsegm(ib, ih, iq, ik):
            return (ib, 0, ik)

    # Scale/segment operands are reshaped so their trailing two dims satisfy
    # Mosaic's tile rules AND land in the kernel in broadcast-ready form:
    # Q-side vectors as columns [s, 1], KV-side vectors as rows [1, s].
    if k_scale_blocked:
        ks_spec = pl.BlockSpec(
            (1, 1, 1, n_kv), ksm_blk, memory_space=pltpu.SMEM
        )
        ks_in = k_scale.astype(jnp.float32)[:, :, None, :]  # [b,hkv,1,n_kv]
    else:
        ks_spec = pl.BlockSpec((1, 1, 1, block_k), ksm)
        ks_in = k_scale.astype(jnp.float32)[:, :, None, :]  # [b,hkv,1,sk]
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), qm),
        pl.BlockSpec(
            (1, 1, block_q, 1), lambda ib, ih, iq, ik: (ib, ih, iq, 0)
        ),
        pl.BlockSpec((1, 1, block_k, d), km),
        ks_spec,
        pl.BlockSpec((1, 1, block_k, d), km),
    ]
    inputs = [
        q_i8,
        q_scale.astype(jnp.float32)[..., None],          # [b,hq,sq,1]
        k_i8,
        ks_in,
        v_q,
    ]
    vchan_spec = pl.BlockSpec(
        (1, 1, 1, d), lambda ib, ih, iq, ik: (ib, ih // group, 0, 0)
    )
    if has_v_scale:
        in_specs.append(vchan_spec)
        inputs.append(v_scale.astype(jnp.float32)[:, :, None, :])  # [b,hkv,1,d]
    if has_v_mean:
        in_specs.append(vchan_spec)
        inputs.append(v_mean.astype(jnp.float32)[:, :, None, :])
    if has_segments:
        in_specs.append(
            pl.BlockSpec((1, block_q, 1), lambda ib, ih, iq, ik: (ib, iq, 0))
        )
        in_specs.append(pl.BlockSpec((1, 1, block_k), kvsegm))
        inputs.append(q_segment_ids.astype(jnp.int32)[..., None])   # [b,sq,1]
        inputs.append(kv_segment_ids.astype(jnp.int32)[:, None, :])  # [b,1,sk]
    if has_positions:
        in_specs.append(
            pl.BlockSpec((1, block_q, 1), lambda ib, ih, iq, ik: (ib, iq, 0))
        )
        in_specs.append(pl.BlockSpec((1, 1, block_k), kvsegm))
        inputs.append(q_positions.astype(jnp.int32)[..., None])     # [b,sq,1]
        inputs.append(kv_positions.astype(jnp.int32)[:, None, :])   # [b,1,sk]

    out_shape = [jax.ShapeDtypeStruct((b, hq, sq, d), out_dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d), qm)]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, hq, sq, 1), jnp.float32))
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, 1), lambda ib, ih, iq, ik: (ib, ih, iq, 0)
            )
        )

    inner = functools.partial(
        _kernel,
        causal=is_causal,
        pv_dtype=pv_dtype,
        k_scale_blocked=k_scale_blocked,
        has_v_scale=has_v_scale,
        has_v_mean=has_v_mean,
        has_segments=has_segments,
        has_positions=has_positions,
        return_lse=return_lse,
        block_q=block_q,
        block_k=block_k,
        n_kv=n_kv,
        out_dtype=out_dtype,
    )

    def kernel(*refs):
        refs = list(refs)
        q_ref, qs_ref, k_ref, ks_ref, v_ref = refs[:5]
        pos = 5
        vs_ref = refs[pos] if has_v_scale else None
        pos += has_v_scale
        vm_ref = refs[pos] if has_v_mean else None
        pos += has_v_mean
        qseg_ref = refs[pos] if has_segments else None
        kseg_ref = refs[pos + 1] if has_segments else None
        pos += 2 * has_segments
        qpos_ref = refs[pos] if has_positions else None
        kpos_ref = refs[pos + 1] if has_positions else None
        pos += 2 * has_positions
        o_ref = refs[pos]
        lse_ref = refs[pos + 1] if return_lse else None
        m_scr, l_scr, acc_scr = refs[-3:]
        inner(
            q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref, vm_ref,
            qseg_ref, kseg_ref, qpos_ref, kpos_ref, o_ref, lse_ref,
            m_scr, l_scr, acc_scr,
        )

    # FLOPs: 2*sq*sk*d (QK) + 2*sq*sk*d (PV) per (b, h); halved by causal.
    flops = 4 * b * hq * sq * sk * d // (2 if is_causal else 1)
    bytes_accessed = (
        q_i8.size + k_i8.size * group + v_q.size * group * v_q.dtype.itemsize
        + b * hq * sq * d * jnp.dtype(out_dtype).itemsize
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=b * hq * sq * sk
        ),
        interpret=interpret,
    )(*inputs)
    if return_lse:
        return outs[0], outs[1][..., 0]
    return outs[0]
