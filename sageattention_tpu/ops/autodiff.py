"""Autodiff support: quantized forward, exact recomputed backward.

The reference is forward-only (inference kernels; no backward exists,
SURVEY.md §2).  Training/fine-tuning through sage attention is still
useful (QAT-style), so the framework defines a custom VJP: the forward is
the fused quantized kernel, the backward is the exact (unquantized)
attention VJP recomputed from the saved q/k/v — a straight-through
estimator through the quantizers.  Residuals are just (q, k, v), O(s*d)
like flash attention.

Backward implementations, in preference order:

* The fused Pallas backward (ops/attention_bwd_pallas.py): the straight-
  through gradient of the actual quantized forward, recomputing P from
  the saved base-2 LSE — O(s*d) memory, no forward recompute (o/lse ride
  in the residuals).
* jax's Pallas flash-attention recompute (TPU, shapes/options the fused
  backward doesn't cover).
* The fp32 reference (CPU fallback / return_lse; materializes scores).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp

from sageattention_tpu.ops import reference

# Save the forward's quantized K/V codes + raw lse2 as extra residuals
# so the fused backward skips every re-quantization pass (~1 ms at the
# tracked b4h16s4096hd128 shape).  Costs ~0.75x of one bf16 KV tensor of
# extra activation memory per layer; set SAGE_SAVE_QUANT_RESIDUALS=0 to
# trade that memory back for the recompute (or wrap the layer in
# jax.checkpoint, which rebuilds them at bwd time anyway).
_SAVE_QUANT_RES = (
    _os.environ.get("SAGE_SAVE_QUANT_RESIDUALS", "1") != "0"
)


def _exact_attention_for_bwd(q, k, v, *, is_causal, sm_scale):
    """Differentiable exact attention used for gradient recomputation.

    Sequence lengths are padded to the flash blocks' multiples with
    segment-id masking (pads attend nothing; their gradients are zero
    and cropped), so any length works."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    hq, hkv = q.shape[1], k.shape[1]
    if jax.default_backend() == "tpu":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        if hq != hkv:
            # express GQA as repeat inside the differentiated fn so the
            # VJP sums gradients back over the group automatically
            k = jnp.repeat(k, hq // hkv, axis=1)
            v = jnp.repeat(v, hq // hkv, axis=1)
        b, _, sq, _ = q.shape
        sk = k.shape[2]
        sq_p = -(-sq // 128) * 128
        sk_p = -(-sk // 128) * 128
        seg = None
        if sq_p != sq or sk_p != sk:
            pad = lambda x, to: jnp.pad(
                x, ((0, 0), (0, 0), (0, to - x.shape[2]), (0, 0))
            )
            q, k, v = pad(q, sq_p), pad(k, sk_p), pad(v, sk_p)
            q_seg = (jnp.arange(sq_p) < sq).astype(jnp.int32)[None]
            kv_seg = (jnp.arange(sk_p) < sk).astype(jnp.int32)[None]
            seg = SegmentIds(
                q=jnp.broadcast_to(q_seg, (b, sq_p)),
                kv=jnp.broadcast_to(kv_seg, (b, sk_p)),
            )

        def fit(s, cands):
            for c in cands:
                if s % c == 0:
                    return c
            return 128

        bq = fit(sq_p, (512, 256, 128))
        bk = fit(sk_p, (1024, 512, 256, 128))
        bkm = fit(sk_p, (2048, 1024, 512, 256, 128))
        bs = BlockSizes(
            block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bkm,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
        )
        o = flash_attention(
            q, k, v, causal=is_causal, sm_scale=sm_scale,
            segment_ids=seg, block_sizes=bs,
        )
        return o[:, :, :sq]
    return reference.attention_reference(
        q, k, v, is_causal=is_causal, sm_scale=sm_scale
    )


# forward kwargs the fused backward models faithfully; anything else
# (smooth_q's column bias, int4, custom granularities/blocks) falls back
# to the flash/exact recompute.  tensor_layout is NOT here: the public
# wrapper normalizes to HND before the VJP so every backward
# implementation sees [b, h, s, d].
_FUSED_BWD_KWARGS = {
    "is_causal", "sm_scale", "return_lse", "pv_dtype", "smooth_k",
    "smooth_v", "window",
}


@functools.lru_cache(maxsize=None)
def _cached(fwd_statics, bwd_statics):
    fwd_kwargs = dict(fwd_statics)
    is_causal, sm_scale, return_lse = bwd_statics
    fused_bwd_ok = set(fwd_kwargs) <= _FUSED_BWD_KWARGS
    smooth_k = fwd_kwargs.get("smooth_k", True)
    window = fwd_kwargs.get("window")

    from sageattention_tpu import core

    @jax.custom_vjp
    def f(q, k, v):
        return core._entry(q, k, v, **fwd_kwargs)

    def fwd(q, k, v):
        # run the forward WITH its LSE and keep (o, lse) as residuals so
        # the fused backward skips the forward recompute.  The sink
        # additionally captures the forward's quantized K/V codes and
        # raw lse2 (core._sageattn_hnd fills it on the pallas path) so
        # the backward skips re-quantization too; ~empty when the
        # forward took a path the fused backward declines anyway.
        kw = dict(fwd_kwargs)
        kw["return_lse"] = True
        save = fused_bwd_ok and _SAVE_QUANT_RES
        sink = {} if save else None
        o, lse = core._entry(q, k, v, residual_sink=sink, **kw)
        out = (o, lse) if return_lse else o
        return out, (q, k, v, o, lse, sink if save else {})

    def bwd(res, ct):
        q, k, v, o_saved, lse_saved, fwd_res = res
        if return_lse:
            do, dlse = ct
        else:
            do, dlse = ct, None
        # first choice: the fused Pallas backward — the straight-through
        # gradient of the actual quantized forward; an LSE cotangent
        # folds into the kernels' D vector (no score materialization)
        from sageattention_tpu.ops import attention_bwd_pallas

        grads = (
            attention_bwd_pallas.quantized_attention_vjp(
                q, k, v, do, is_causal=is_causal, sm_scale=sm_scale,
                o=o_saved, lse_nat=lse_saved, dlse=dlse,
                smooth_k=smooth_k, window=window,
                pv_dtype=fwd_kwargs.get("pv_dtype", "int8"),
                smooth_v=fwd_kwargs.get("smooth_v", False),
                fwd_res=fwd_res,
                interpret=jax.default_backend() == "cpu",
            )
            if fused_bwd_ok
            else None
        )
        if grads is not None:
            return grads

        if dlse is not None or window is not None:
            # exact reference fallback (materializes scores) — the only
            # path that models the sliding-window band and LSE cotangents
            def exact(q, k, v):
                mask = None
                if window is not None:
                    mask = reference.window_band_mask(
                        q.shape[2], k.shape[2], window
                    )
                return reference.attention_reference(
                    q, k, v, is_causal=is_causal, sm_scale=sm_scale,
                    attn_mask=mask, return_lse=dlse is not None,
                )

            _, vjp = jax.vjp(exact, q, k, v)
            return vjp((do, dlse) if dlse is not None else do)

        def exact(q, k, v):
            return _exact_attention_for_bwd(
                q, k, v, is_causal=is_causal, sm_scale=sm_scale
            )

        _, vjp = jax.vjp(exact, q, k, v)
        return vjp(do)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _cached_bias(fwd_statics, bwd_statics):
    """custom_vjp over (q, k, v, attn_bias): quantized Pallas forward,
    exact recomputed backward (reference VJP — materializes scores,
    O(s^2) memory; a bias cotangent is itself [b, h, sq, sk], so the
    footprint is inherent to asking for dBias).  Beyond the reference
    (forward-only): trainable relative-position / ALiBi-style biases."""
    fwd_kwargs = dict(fwd_statics)
    is_causal, sm_scale, return_lse = bwd_statics
    fused_ok = set(fwd_kwargs) <= _FUSED_BWD_KWARGS
    smooth_k = fwd_kwargs.get("smooth_k", True)
    window = fwd_kwargs.get("window")

    from sageattention_tpu import core

    @jax.custom_vjp
    def f(q, k, v, bias):
        return core._entry(q, k, v, attn_bias=bias, **fwd_kwargs)

    def fwd(q, k, v, bias):
        kw = dict(fwd_kwargs)
        kw["return_lse"] = True
        o, lse = core._entry(q, k, v, attn_bias=bias, **kw)
        out = (o, lse) if return_lse else o
        return out, (q, k, v, bias, o, lse)

    def bwd(res, ct):
        q, k, v, bias, o_saved, lse_saved = res
        if return_lse:
            do, dlse = ct
        else:
            do, dlse = ct, None
        # first choice: the fused Pallas backward with the blockwise dS
        # output — no score-sized temporaries beyond the dBias cotangent
        # itself (per-head full-shape biases; broadcast forms fall back)
        from sageattention_tpu.ops import attention_bwd_pallas

        grads = (
            attention_bwd_pallas.quantized_attention_vjp(
                q, k, v, do, is_causal=is_causal, sm_scale=sm_scale,
                o=o_saved, lse_nat=lse_saved, dlse=dlse,
                smooth_k=smooth_k, window=window,
                pv_dtype=fwd_kwargs.get("pv_dtype", "int8"),
                smooth_v=fwd_kwargs.get("smooth_v", False),
                attn_bias=bias, need_dbias=True,
                interpret=jax.default_backend() == "cpu",
            )
            if fused_ok
            else None
        )
        if grads is not None:
            return grads

        def exact(q, k, v, bias):
            mask = None
            if window is not None:
                mask = reference.window_band_mask(
                    q.shape[2], k.shape[2], window
                )
            return reference.attention_reference(
                q, k, v, is_causal=is_causal, sm_scale=sm_scale,
                attn_bias=bias, attn_mask=mask,
                return_lse=dlse is not None,
            )

        _, vjp = jax.vjp(exact, q, k, v, bias)
        return vjp((do, dlse) if dlse is not None else do)

    f.defvjp(fwd, bwd)
    return f


def differentiable_sageattn_bias(q, k, v, bias, **kwargs):
    """sageattn with an additive bias, differentiable w.r.t. q, k, v AND
    the bias.  HND layout; kwargs must be hashable statics."""
    is_causal = kwargs.get("is_causal", False)
    sm_scale = kwargs.get("sm_scale", None)
    return_lse = kwargs.get("return_lse", False)
    fwd_statics = tuple(sorted(kwargs.items()))
    return _cached_bias(
        fwd_statics, (is_causal, sm_scale, return_lse)
    )(q, k, v, bias)


def differentiable_sageattn(q, k, v, **kwargs):
    """sageattn with gradients (w.r.t. q, k, v).

    kwargs must be hashable statics (no segment/position/bias tensors).
    """
    layout = kwargs.pop("tensor_layout", "HND")
    if layout == "NHD":
        # normalize here so the VJP (fused / flash / exact) always sees HND
        q, k, v = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    elif layout != "HND":
        raise ValueError(f"tensor_layout must be 'HND' or 'NHD', got {layout!r}")
    is_causal = kwargs.get("is_causal", False)
    sm_scale = kwargs.get("sm_scale", None)
    return_lse = kwargs.get("return_lse", False)
    fwd_statics = tuple(sorted(kwargs.items()))
    out = _cached(fwd_statics, (is_causal, sm_scale, return_lse))(q, k, v)
    if layout == "NHD":
        if return_lse:
            return jnp.swapaxes(out[0], 1, 2), out[1]
        return jnp.swapaxes(out, 1, 2)
    return out
