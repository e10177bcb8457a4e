"""Fused quantization prologue kernels (Pallas / Mosaic).

The TPU equivalents of the reference's ``_fused`` CUDA extension
(reference: csrc/fused/fused.cu): each tensor is quantized in a single
HBM read + write pass, with the auxiliary transform fused in —

* :func:`quant_q_per_token` — per-row INT8 quantization of Q with the
  ``sm_scale * log2e`` fold (reference: QuantInt8Kernel, fused.cu:64-198;
  scale fold reference: quant.py:95).
* :func:`quant_k_chunked` — K mean-subtraction (smooth_k) fused with
  per-chunk INT8 quantization (reference:
  quant_per_block_int8_fuse_sub_mean_cuda, fused.cu:594-682); the chunk
  group equals the attention kernel's KV chunk so the kernel reads one
  scale scalar per chunk from SMEM.

The pure-JAX functions in ``sageattention_tpu.quant`` are the numerical
spec; these kernels must match them bit-exactly on aligned shapes
(tests/test_quant.py enforces it).  V's per-channel quantization needs a
full-sequence column reduction first, which XLA already fuses well — it
stays in quant.py (the reference's MeanScaleKernel analogue,
fused.cu:316-427).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_half_away(x):
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def _quant_q_kernel(q_ref, o_ref, s_ref, *, scale_fold, qmax, valid, block_s):
    i = pl.program_id(2)
    x = q_ref[0, 0].astype(jnp.float32)  # [block_s, d]
    if valid is not None:
        # mask pad rows so their (garbage) contents can't poison anything
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = jnp.where(row + i * block_s < valid, x, 0.0)
    amax = jnp.max(jnp.abs(x), axis=1)[:, None]  # [block_s, 1]
    scale = jnp.maximum(amax, 1e-30) / qmax
    q = _round_half_away(x / scale)
    o_ref[0, 0] = jnp.clip(q, -qmax, qmax).astype(jnp.int8)
    s_ref[0, 0] = scale * scale_fold


@functools.partial(
    jax.jit, static_argnames=("scale_fold", "bits", "block_s", "interpret")
)
def quant_q_per_token(
    q: jax.Array,
    *,
    scale_fold: float = 1.0,
    bits: int = 8,
    block_s: int = 512,
    interpret: bool = False,
):
    """[b,h,s,d] -> (int8 [b,h,s,d], f32 scales [b,h,s]) in one fused pass."""
    b, h, s, d = q.shape
    qmax = 7.0 if bits == 4 else 127.0
    block_s = min(block_s, -(-s // 128) * 128)
    n = -(-s // block_s)
    s_pad = n * block_s
    valid = None if s_pad == s else s
    grid = (b, h, n)
    out, scale = pl.pallas_call(
        functools.partial(
            _quant_q_kernel, scale_fold=scale_fold, qmax=qmax, valid=valid,
            block_s=block_s,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1, block_s, d),
                               lambda ib, ih, i: (ib, ih, i, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, block_s, d), lambda ib, ih, i: (ib, ih, i, 0)),
            pl.BlockSpec((1, 1, block_s, 1), lambda ib, ih, i: (ib, ih, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((b, h, s_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3
        ),
        interpret=interpret,
    )(q)
    return out[:, :, :s], scale[:, :, :s, 0]


def _quant_k_kernel(
    k_ref, km_ref, o_ref, s_ref, *, qmax, valid, group, smooth
):
    i = pl.program_id(2)
    x = k_ref[0, 0].astype(jnp.float32)  # [group, d]
    if smooth:
        x = x - km_ref[0, 0]  # [1, d] broadcast
    if valid is not None:
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = jnp.where(row + i * group < valid, x, 0.0)
    amax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(amax, 1e-30) / qmax
    q = _round_half_away(x / scale)
    o_ref[0, 0] = jnp.clip(q, -qmax, qmax).astype(jnp.int8)
    # whole scale row rides in SMEM; each grid step fills its entry
    s_ref[0, 0, i, 0] = scale


@functools.partial(
    jax.jit, static_argnames=("group", "bits", "interpret")
)
def quant_k_chunked(
    k: jax.Array,
    km: jax.Array | None = None,
    *,
    group: int,
    bits: int = 8,
    interpret: bool = False,
):
    """[b,h,s,d] -> (int8 [b,h,s,d], f32 scales [b,h,ceil(s/group)]),
    optionally subtracting the per-channel mean ``km`` [b,h,d] (smooth_k)
    in the same pass."""
    b, h, s, d = k.shape
    qmax = 7.0 if bits == 4 else 127.0
    n = -(-s // group)
    s_pad = n * group
    valid = None if s_pad == s else s
    smooth = km is not None
    grid = (b, h, n)
    in_specs = [
        pl.BlockSpec((1, 1, group, d), lambda ib, ih, i: (ib, ih, i, 0))
    ]
    inputs = [k]
    if smooth:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, d), lambda ib, ih, i: (ib, ih, 0, 0))
        )
        inputs.append(km.astype(jnp.float32)[:, :, None, :])

    def kernel(*refs):
        if smooth:
            k_ref, km_ref, o_ref, s_ref = refs
        else:
            (k_ref, o_ref, s_ref) = refs
            km_ref = None
        _quant_k_kernel(
            k_ref, km_ref, o_ref, s_ref,
            qmax=qmax, valid=valid, group=group, smooth=smooth,
        )

    out, scale = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, group, d), lambda ib, ih, i: (ib, ih, i, 0)),
            pl.BlockSpec(
                (1, 1, n, 1),
                lambda ib, ih, i: (ib, ih, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3
        ),
        interpret=interpret,
    )(*inputs)
    return out[:, :, :s], scale[:, :, :, 0]
