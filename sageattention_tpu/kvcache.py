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
    and decode (t = 1) alike.

    The caller owns capacity: offsets are dynamic-update-slice semantics,
    so an append past ``max_len`` clamps to the end and overwrites the
    tail rather than raising (jit-compatible); size the cache for the
    longest sequence."""
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


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "window", "interpret")
)
def sageattn_decode(
    q: jax.Array,            # [b, hq, t_q, d]
    cache: QuantKVCache,
    lengths: jax.Array,      # [b] int32 live lengths INCLUDING the new
                             # tokens q corresponds to
    *,
    sm_scale: float | None = None,
    window: int | None = None,
    interpret: bool = False,
):
    """Decode attention of the current query tokens against the cache.

    The caller appends the step's K/V first (append_kv), then calls this
    with the updated lengths; with t_q > 1 the causal tail applies
    within the new tokens (speculative / chunked decode).  ``window``
    (Mistral/Gemma-style sliding window): each query attends only its
    last ``window`` keys, and the kernel reads only the cache chunks the
    window reaches — per-step cost O(window) at any context length."""
    return decode_pallas.sage_decode_attention(
        q,
        cache.k_i8,
        cache.k_scale,
        cache.v_i8,
        cache.v_scale,
        lengths,
        sm_scale=sm_scale,
        window=window,
        interpret=interpret or jax.default_backend() == "cpu",
    )


# ---------------------------------------------------------------------------
# Paged cache (vLLM-style): a shared pool of fixed-size pages + per-sequence
# page tables; the decode kernel gathers physical pages through scalar
# prefetch (ops/paged_decode_pallas.py).  TPU paging favors coarse pages
# (default 1024 tokens — chunks below ~1024 starve the VPU).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Page pool [num_pages, h_kv, page, d] int8 + per-token scales and
    the [b, max_pages] page table.  Physical page assignment is the
    caller's policy (any permutation works; entries past the live
    length are DMA'd but masked)."""

    pages_k: jax.Array
    pages_k_scale: jax.Array
    pages_v: jax.Array
    pages_v_scale: jax.Array
    page_table: jax.Array

    @property
    def page_size(self) -> int:
        return self.pages_k.shape[2]


def init_paged_kv_cache(
    num_pages: int, h_kv: int, head_dim: int, page_table: jax.Array,
    page_size: int = 1024,
) -> PagedKVCache:
    return PagedKVCache(
        pages_k=jnp.zeros((num_pages, h_kv, page_size, head_dim),
                          jnp.int8),
        pages_k_scale=jnp.full((num_pages, h_kv, page_size), 1e-30,
                               jnp.float32),
        pages_v=jnp.zeros((num_pages, h_kv, page_size, head_dim),
                          jnp.int8),
        pages_v_scale=jnp.full((num_pages, h_kv, page_size), 1e-30,
                               jnp.float32),
        page_table=page_table.astype(jnp.int32),
    )


@jax.jit
def paged_append(
    cache: PagedKVCache,
    lengths: jax.Array,      # [b]
    k_new: jax.Array,        # [b, h_kv, t, d]
    v_new: jax.Array,        # [b, h_kv, t, d]
) -> tuple[PagedKVCache, jax.Array]:
    """Quantize and write ``t`` tokens per sequence at ``lengths``,
    following the page table across page boundaries.  Pure quantized
    writes (per-token scales), like the dense append."""
    page = cache.page_size
    k_q, k_s = _quant_rows(k_new)   # [b,h,t,d], [b,h,t]
    v_q, v_s = _quant_rows(v_new)
    b, h, t, d = k_q.shape

    # destination of token j of sequence i: physical page
    # page_table[i, (lengths[i]+j)//page], row (lengths[i]+j) % page
    pos = lengths[:, None] + jnp.arange(t)[None, :]        # [b, t]
    phys = jnp.take_along_axis(
        cache.page_table, pos // page, axis=1
    )                                                      # [b, t]
    off = pos % page                                        # [b, t]

    def scatter_pool(pool, rows):
        # pool [P, h, page, d?]; rows [b, h, t, (d)] -> scatter (b*t) rows
        rows_flat = jnp.moveaxis(rows, 1, 2).reshape(
            (b * t, h) + rows.shape[3:]
        )  # [(b t), h, d?]
        return pool.at[phys.reshape(-1), :, off.reshape(-1)].set(
            rows_flat
        )

    cache = PagedKVCache(
        pages_k=scatter_pool(cache.pages_k, k_q),
        pages_k_scale=scatter_pool(cache.pages_k_scale, k_s),
        pages_v=scatter_pool(cache.pages_v, v_q),
        pages_v_scale=scatter_pool(cache.pages_v_scale, v_s),
        page_table=cache.page_table,
    )
    return cache, lengths + t


@jax.jit
def paged_prefill(
    cache: PagedKVCache,
    k: jax.Array,            # [b, h_kv, t, d], t a multiple of page_size
    v: jax.Array,
) -> tuple[PagedKVCache, jax.Array]:
    """Bulk-load empty sequences: writes whole pages through the page
    table (page-granular scatter — token-granular paged_append is for
    decode steps; a 32k-token prefill would otherwise scatter 32k rows).
    Requires t % page_size == 0 and empty sequences."""
    page = cache.page_size
    b, h, t, d = k.shape
    assert t % page == 0, (t, page)
    n_used = t // page
    k_q, k_s = _quant_rows(k)
    v_q, v_s = _quant_rows(v)

    ids = cache.page_table[:, :n_used].reshape(-1)  # [b*n_used]

    def put(pool, rows, has_d):
        # rows [b, h, t, (d)] -> [b*n_used, h, page, (d)]
        if has_d:
            r = rows.reshape(b, h, n_used, page, d)
            r = jnp.moveaxis(r, 2, 1).reshape(b * n_used, h, page, d)
        else:
            r = rows.reshape(b, h, n_used, page)
            r = jnp.moveaxis(r, 2, 1).reshape(b * n_used, h, page)
        return pool.at[ids].set(r)

    cache = PagedKVCache(
        pages_k=put(cache.pages_k, k_q, True),
        pages_k_scale=put(cache.pages_k_scale, k_s, False),
        pages_v=put(cache.pages_v, v_q, True),
        pages_v_scale=put(cache.pages_v_scale, v_s, False),
        page_table=cache.page_table,
    )
    return cache, jnp.full((b,), t, jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "window", "interpret")
)
def sageattn_paged_decode(
    q: jax.Array,            # [b, hq, t_q, d]
    cache: PagedKVCache,
    lengths: jax.Array,      # [b]
    *,
    sm_scale: float | None = None,
    window: int | None = None,
    interpret: bool = False,
):
    """Decode attention through the page table (scalar-prefetch gather;
    same query semantics as sageattn_decode, including ``window``:
    only the pages the sliding window reaches are read)."""
    from sageattention_tpu.ops import paged_decode_pallas

    return paged_decode_pallas.sage_paged_decode_attention(
        q,
        cache.pages_k,
        cache.pages_k_scale,
        cache.pages_v,
        cache.pages_v_scale,
        cache.page_table,
        lengths,
        sm_scale=sm_scale,
        window=window,
        interpret=interpret or jax.default_backend() == "cpu",
    )
