"""Decoder-only LLM — SageAttention's second headline use case (causal
attention, reference bench sweep: bench_qk_int8_pv_fp8_cuda.py
is_causal=True shapes).

Llama-style: RMSNorm, RoPE, GQA, SwiGLU, causal sage attention via the
pluggable backend.  Two paths:

* prefill — full-sequence causal attention (the reference's use case),
  optionally filling the int8 KV caches as it goes;
* decode — token-at-a-time generation over the quantized KV cache
  (kvcache.sageattn_decode), beyond the reference (its kernels are
  prefill/training-shape only).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sageattention_tpu import kvcache
from sageattention_tpu.models.attention import (
    attention as _attention,
)
from sageattention_tpu.models.configs import LLMConfig


def rope(x, positions, base=10000.0):
    """x: [b, h, s, d]; rotate pairs (d/2)."""
    d = x.shape[-1]
    half = d // 2
    freqs = base ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[:, None, :, None] * freqs  # [b,1,s,half]
    sin, cos = jnp.sin(ang), jnp.cos(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [
            (x1 * cos - x2 * sin).astype(x.dtype),
            (x2 * cos + x1 * sin).astype(x.dtype),
        ],
        axis=-1,
    )


class LLMBlock(nn.Module):
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, positions, cache=None, lengths=None,
                 decode=False):
        c = self.cfg
        b, s, _ = x.shape
        h = nn.RMSNorm(dtype=jnp.float32, name="attn_norm")(x).astype(
            self.dtype
        )
        q = nn.Dense(c.heads * c.head_dim, use_bias=False, dtype=self.dtype)(h)
        k = nn.Dense(c.kv_heads * c.head_dim, use_bias=False, dtype=self.dtype)(h)
        v = nn.Dense(c.kv_heads * c.head_dim, use_bias=False, dtype=self.dtype)(h)

        def to_hnd(t, nh):
            return jnp.swapaxes(t.reshape(b, s, nh, c.head_dim), 1, 2)

        q = rope(to_hnd(q, c.heads), positions)
        k = rope(to_hnd(k, c.kv_heads), positions)
        v = to_hnd(v, c.kv_heads)
        W = c.window
        wkw = {} if W is None else {"window": W}
        if decode and cache is None:
            # decoding without a cache would attend only the current
            # token(s) — context-free logits that LOOK valid; fail loudly
            raise ValueError(
                "decode=True requires caches (init_caches / "
                "init_paged_caches); got None"
            )
        new_cache = None
        if cache is not None and cache.bits == 4 and lengths is not None:
            # int4 cache: freeze per-channel K/V means on each batch's
            # FIRST write (lengths == 0) — prefill or the first chunked-
            # prefill block alike; live batches keep their frozen means
            # (the calibrate empty-cache contract, enforced per batch).
            # The corrections are exact — see kvcache.calibrate
            cache = kvcache.calibrate(cache, k, v, lengths)
        if isinstance(cache, kvcache.PagedKVCache):
            # vLLM-style paged serving: appends follow the page table,
            # decode gathers physical pages via scalar prefetch.  The
            # non-decode path is a whole-prompt prefill (lengths == 0
            # contract) — write page-granular bulk pages when the shape
            # allows instead of scattering s individual token rows
            if not decode and s % cache.page_size == 0:
                new_cache, new_len = kvcache.paged_prefill(cache, k, v)
            else:
                new_cache, new_len = kvcache.paged_append(
                    cache, lengths, k, v
                )
            if decode:
                o = kvcache.sageattn_paged_decode(q, new_cache, new_len,
                                                  window=W)
            else:
                o = _attention(q, k, v, is_causal=True, **wkw)
        elif cache is not None:
            new_cache, new_len = kvcache.append_kv(cache, lengths, k, v)
            if decode:
                o = kvcache.sageattn_decode(q, new_cache, new_len,
                                            window=W)
            else:
                # prefill: attend the prompt directly (faster than
                # reading the cache back); the cache is now filled
                o = _attention(q, k, v, is_causal=True, **wkw)
        else:
            o = _attention(q, k, v, is_causal=True, **wkw)
        o = jnp.swapaxes(o, 1, 2).reshape(b, s, c.heads * c.head_dim)
        x = x + nn.Dense(c.hidden, use_bias=False, dtype=self.dtype, name="o_proj")(o)

        h = nn.RMSNorm(dtype=jnp.float32, name="mlp_norm")(x).astype(self.dtype)
        mh = c.mlp_hidden or 4 * c.hidden
        gate = nn.Dense(mh, use_bias=False, dtype=self.dtype, name="gate")(h)
        up = nn.Dense(mh, use_bias=False, dtype=self.dtype, name="up")(h)
        down = nn.Dense(
            c.hidden, use_bias=False, dtype=self.dtype, name="down"
        )(nn.silu(gate) * up)
        return x + down, new_cache


class CausalLM(nn.Module):
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, caches=None, lengths=None, decode=False):
        """Prefill: ``__call__(tokens)`` -> logits; with ``caches`` (a
        list of per-layer QuantKVCache) the prompt is also written into
        them (expects lengths == 0 — the non-decode path attends only
        the given tokens).  Decode/continuation: ``decode=True`` with
        the current ``lengths`` -> (logits, new_caches) attending the
        int8 cache (t > 1 gets the causal tail, so chunked prefill
        continuation also goes through decode=True)."""
        c = self.cfg
        b, s = tokens.shape
        x = nn.Embed(c.vocab, c.hidden, dtype=self.dtype, name="embed")(tokens)
        if lengths is None:
            if caches is not None:
                # the advertised prefill form: caches given, lengths
                # defaulting to empty sequences
                lengths = jnp.zeros((b,), jnp.int32)
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        else:
            positions = lengths[:, None] + jnp.arange(s)[None, :]
        new_caches = [] if caches is not None else None
        for i in range(c.depth):
            cache_i = caches[i] if caches is not None else None
            x, nc = LLMBlock(c, self.dtype, name=f"layer_{i}")(
                x, positions, cache=cache_i, lengths=lengths,
                decode=decode,
            )
            if new_caches is not None:
                new_caches.append(nc)
        x = nn.RMSNorm(dtype=jnp.float32, name="final_norm")(x)
        logits = nn.Dense(
            c.vocab, use_bias=False, dtype=jnp.float32, name="lm_head"
        )(x)
        if caches is not None:
            return logits, new_caches
        return logits

    def init_caches(self, b: int, max_len: int, bits: int = 8):
        c = self.cfg
        return [
            kvcache.init_kv_cache(
                b, c.kv_heads, max_len, c.head_dim, bits=bits
            )
            for _ in range(c.depth)
        ]

    def init_paged_caches(
        self, b: int, max_len: int, page_size: int = 1024,
        page_table: jax.Array | None = None, bits: int = 8,
    ):
        """Per-layer paged pools sized for ``b`` sequences of ``max_len``
        tokens.  Default policy: a linear page table (sequence i owns
        pages [i*n, (i+1)*n)); pass ``page_table`` [b, n] for any other
        physical assignment — the kernel gathers through it either way."""
        c = self.cfg
        n = -(-max_len // page_size)
        if page_table is None:
            page_table = jnp.arange(b * n, dtype=jnp.int32).reshape(b, n)
        return [
            kvcache.init_paged_kv_cache(
                b * n, c.kv_heads, c.head_dim, page_table,
                page_size=page_size, bits=bits,
            )
            for _ in range(c.depth)
        ]
