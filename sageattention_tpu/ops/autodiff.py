"""Autodiff support: quantized forward, exact recomputed backward.

The reference is forward-only (inference kernels; no backward exists,
SURVEY.md §2).  Training/fine-tuning through sage attention is still
useful (QAT-style), so the framework defines a custom VJP: the forward is
the fused quantized kernel, the backward is the exact attention VJP
recomputed from the saved q/k/v (a straight-through estimator through the
quantizers).  Residuals are just (q, k, v) — O(s*d) like flash attention —
but the recompute currently materializes the score matrix (an XLA
backward; a fused Pallas backward kernel is the planned upgrade).
"""

from __future__ import annotations

import functools

import jax

from sageattention_tpu.ops import reference


@functools.lru_cache(maxsize=None)
def _cached(fwd_statics, bwd_statics):
    fwd_kwargs = dict(fwd_statics)
    is_causal, sm_scale, return_lse = bwd_statics

    from sageattention_tpu import core

    @jax.custom_vjp
    def f(q, k, v):
        return core._entry(q, k, v, **fwd_kwargs)

    def fwd(q, k, v):
        return f(q, k, v), (q, k, v)

    def bwd(res, ct):
        q, k, v = res

        def exact(q, k, v):
            return reference.attention_reference(
                q,
                k,
                v,
                is_causal=is_causal,
                sm_scale=sm_scale,
                return_lse=return_lse,
            )

        _, vjp = jax.vjp(exact, q, k, v)
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f


def differentiable_sageattn(q, k, v, **kwargs):
    """sageattn with gradients (w.r.t. q, k, v).

    kwargs must be hashable statics (no segment/position/bias tensors).
    """
    is_causal = kwargs.get("is_causal", False)
    sm_scale = kwargs.get("sm_scale", None)
    return_lse = kwargs.get("return_lse", False)
    fwd_statics = tuple(sorted(kwargs.items()))
    return _cached(fwd_statics, (is_causal, sm_scale, return_lse))(q, k, v)
