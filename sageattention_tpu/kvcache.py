"""Quantized KV cache for decode serving (beyond the reference).

The reference accelerates diffusion and LLM *prefill*; this module adds
the serving decode loop: an int8 KV cache with **per-token scales** so
appends are pure quantized writes — no chunk requantization, no
clipping against stale amax, no drift — plus the bandwidth-bound decode
kernel (ops/decode_pallas.py).  The int8 cache halves HBM footprint
(2x batch or context per chip) and roughly halves long-context decode
latency (the decode step streams the cache once).

Usage:

    cache = init_kv_cache(b, h_kv, max_len, head_dim)
    cache, lengths = append_kv(cache, lengths, k_new, v_new)   # prefill
    o = sageattn_decode(q, cache, lengths)                     # per step

``cache`` is a pytree (dataclass of arrays) — jit/scan/pmap-friendly.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from sageattention_tpu import quant as quant_mod
from sageattention_tpu.ops import decode_pallas


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantKVCache:
    """int8 K/V with per-token scales; [b, h_kv, max_len, d] + [b, h_kv,
    max_len]."""

    k_i8: jax.Array
    k_scale: jax.Array
    v_i8: jax.Array
    v_scale: jax.Array

    @property
    def max_len(self) -> int:
        return self.k_i8.shape[2]


def init_kv_cache(
    b: int, h_kv: int, max_len: int, head_dim: int
) -> QuantKVCache:
    return QuantKVCache(
        k_i8=jnp.zeros((b, h_kv, max_len, head_dim), jnp.int8),
        k_scale=jnp.full((b, h_kv, max_len), 1e-30, jnp.float32),
        v_i8=jnp.zeros((b, h_kv, max_len, head_dim), jnp.int8),
        v_scale=jnp.full((b, h_kv, max_len), 1e-30, jnp.float32),
    )


def _quant_rows(x: jax.Array):
    """Per-token (row) int8 quantization of [b, h, t, d]."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale, r = quant_mod.inv_scale(amax, 127.0)
    q = jnp.clip(
        quant_mod.round_half_away(xf * r[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


@jax.jit
def append_kv(
    cache: QuantKVCache,
    lengths: jax.Array,       # [b] int32: tokens already in the cache
    k_new: jax.Array,         # [b, h_kv, t, d]
    v_new: jax.Array,         # [b, h_kv, t, d]
) -> tuple[QuantKVCache, jax.Array]:
    """Quantize and write ``t`` new tokens at each batch's ``lengths``
    offset.  Returns (cache, lengths + t).  Works for prefill (large t)
    and decode (t = 1) alike."""
    k_q, k_s = _quant_rows(k_new)
    v_q, v_s = _quant_rows(v_new)

    def upd4(buf, new, off):
        return jax.lax.dynamic_update_slice(buf, new, (0, off, 0))

    def upd3(buf, new, off):
        return jax.lax.dynamic_update_slice(buf, new, (0, off))

    cache = QuantKVCache(
        k_i8=jax.vmap(upd4)(cache.k_i8, k_q, lengths),
        k_scale=jax.vmap(upd3)(cache.k_scale, k_s, lengths),
        v_i8=jax.vmap(upd4)(cache.v_i8, v_q, lengths),
        v_scale=jax.vmap(upd3)(cache.v_scale, v_s, lengths),
    )
    return cache, lengths + k_new.shape[2]


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def sageattn_decode(
    q: jax.Array,            # [b, hq, t_q, d]
    cache: QuantKVCache,
    lengths: jax.Array,      # [b] int32 live lengths INCLUDING the new
                             # tokens q corresponds to
    *,
    sm_scale: float | None = None,
    interpret: bool = False,
):
    """Decode attention of the current query tokens against the cache.

    The caller appends the step's K/V first (append_kv), then calls this
    with the updated lengths; with t_q > 1 the causal tail applies
    within the new tokens (speculative / chunked decode)."""
    return decode_pallas.sage_decode_attention(
        q,
        cache.k_i8,
        cache.k_scale,
        cache.v_i8,
        cache.v_scale,
        lengths,
        sm_scale=sm_scale,
        interpret=interpret or jax.default_backend() == "cpu",
    )
