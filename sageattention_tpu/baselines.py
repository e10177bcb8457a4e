"""Baseline attention adapters (reference: sageattention/fa3_wrapper.py).

The reference wraps FlashAttention-3 (fp16 and per-tensor-FP8) behind the
same call signature as ``sageattn`` so benchmarks and examples can swap
implementations (reference: fa3_wrapper.py:11-77).  The TPU analogues:

* :func:`flash` — jax's tuned Pallas flash-attention kernel (the FA2/FA3
  class baseline on TPU).
* :func:`flash_int8_pertensor` — flash attention fed per-tensor-quantized
  int8 Q/K (global amax/127 scales, dequantized on entry) — the accuracy
  analogue of the reference's per-tensor FP8 FA3 (``fa3_fp8``,
  fa3_wrapper.py:64-70, q/k/v amax/448): it shows what *coarse* per-tensor
  scaling does to accuracy versus SageAttention's fine-grained scales.
* :func:`sdpa` — jax.nn.dot_product_attention (XLA fused attention).

All take HND ([b, h, s, d]) or NHD layouts like ``sageattn``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Layout = str


def _to_hnd(x, layout):
    return x if layout == "HND" else jnp.swapaxes(x, 1, 2)


def _from_hnd(x, layout):
    return x if layout == "HND" else jnp.swapaxes(x, 1, 2)


def _div_le(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that is <= cap, preferring multiples of
    128 (the kernel's lane-tile requirement for block_k)."""
    d = min(cap, n) // 128 * 128
    while d >= 128 and n % d:
        d -= 128
    if d >= 128:
        return d
    d = min(cap, n)
    while n % d:
        d -= 1
    return d


def _flash_fn(sq: int, sk: int, causal: bool, sm_scale: float):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    # the kernel requires block_q <= q_seq_len and kv_seq_len divisible
    # by block_k/block_k_major; power-of-two bench shapes keep the tuned
    # 512/1024/2048 blocks, everything else (cross-attention, odd DiT
    # lengths) rounds down to a divisor instead of crashing
    bq = _div_le(sq, min(512, sq))
    bk = _div_le(sk, min(1024, sk))
    bkm = _div_le(sk, min(2048, sk))
    if bkm % bk:
        bkm = bk
    bs = BlockSizes(
        block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkm,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
    )
    return functools.partial(
        flash_attention, causal=causal, sm_scale=sm_scale, block_sizes=bs
    )


def flash(q, k, v, tensor_layout: Layout = "HND", is_causal: bool = False,
          sm_scale: float | None = None):
    """Tuned Pallas flash-attention baseline (reference: fa3_wrapper.py:11
    ``fa3``)."""
    q = _to_hnd(q, tensor_layout)
    k = _to_hnd(k, tensor_layout)
    v = _to_hnd(v, tensor_layout)
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    try:
        o = _flash_fn(q.shape[2], k.shape[2], is_causal, sm_scale)(q, k, v)
    except (NotImplementedError, ValueError):
        # shapes the tuned kernel cannot tile (e.g. kv_len with no
        # 128-multiple divisor): XLA attention is the honest baseline
        o = sdpa(q, k, v, "HND", is_causal, sm_scale)
    return _from_hnd(o, tensor_layout)


def flash_int8_pertensor(q, k, v, tensor_layout: Layout = "HND",
                         is_causal: bool = False,
                         sm_scale: float | None = None):
    """Per-tensor-quantized baseline (reference: fa3_wrapper.py:64-70
    ``fa3_fp8``): one global scale per tensor, the coarsest quantization —
    the accuracy strawman SageAttention's per-token/per-chunk scales beat."""
    q = _to_hnd(q, tensor_layout)
    k = _to_hnd(k, tensor_layout)
    v = _to_hnd(v, tensor_layout)
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5

    from sageattention_tpu.quant import round_half_away

    def qdq(x):  # quantize-dequantize with one per-tensor scale
        # same rounding spec as every other int8 path in the package
        scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-30) / 127.0
        xi = jnp.clip(round_half_away(x.astype(jnp.float32) / scale), -127, 127)
        return (xi.astype(jnp.int8).astype(jnp.float32) * scale).astype(
            jnp.bfloat16
        )

    try:
        o = _flash_fn(q.shape[2], k.shape[2], is_causal, sm_scale)(
            qdq(q), qdq(k), qdq(v)
        )
    except (NotImplementedError, ValueError):
        o = sdpa(qdq(q), qdq(k), qdq(v), "HND", is_causal, sm_scale)
    return _from_hnd(o, tensor_layout)


def sdpa(q, k, v, tensor_layout: Layout = "HND", is_causal: bool = False,
         sm_scale: float | None = None):
    """jax.nn.dot_product_attention (XLA) baseline (reference:
    bench/bench_baseline.py torch-SDPA backends)."""
    q = _to_hnd(q, tensor_layout)
    k = _to_hnd(k, tensor_layout)
    v = _to_hnd(v, tensor_layout)
    o = jax.nn.dot_product_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        is_causal=is_causal, scale=sm_scale, implementation="xla",
    )
    return _from_hnd(jnp.swapaxes(o, 1, 2), tensor_layout)
