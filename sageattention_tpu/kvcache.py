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
    """int8 (or 4-bit, ``bits=4``) K/V with per-token scales;
    [b, h_kv, max_len, d] + [b, h_kv, max_len].  The 4-bit cache packs
    two channels per int8 byte (see ``_pack_nibbles``) — half the HBM
    footprint and read bytes without the ``jnp.int4`` dtype, which this
    backend cannot pass across jit boundaries (RecursionError in the
    transfer path).

    ``k_mean`` / ``v_mean`` ([b, h_kv, 1, d], default zero) hold fixed
    per-channel means subtracted before quantization (``calibrate``):
    the K shift is softmax-invariant (every key's score moves by the
    same q·km), and the V shift adds back exactly because softmax rows
    sum to one — so both corrections are FREE, and the quantizer only
    has to cover the residual range.  The means must be frozen before
    the first append (mixing means across appends would break the K
    invariance)."""

    k_i8: jax.Array
    k_scale: jax.Array
    v_i8: jax.Array
    v_scale: jax.Array
    k_mean: jax.Array
    v_mean: jax.Array

    @property
    def max_len(self) -> int:
        return self.k_i8.shape[2]

    @property
    def bits(self) -> int:
        # a 4-bit cache stores d/2 packed bytes per token; k_mean always
        # carries the full head_dim
        return 4 if self.k_i8.shape[-1] != self.k_mean.shape[-1] else 8


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """Pack int8 values in [-7, 7] two-per-byte, SPLIT-HALF layout:
    byte j of a d-channel row holds channel j (low nibble, two's
    complement) and channel j + d/2 (high nibble).  The kernels unpack
    with two shifts + one lane concat — natural channel order, no
    lane interleave (a relayout Mosaic would serialize)."""
    d = q.shape[-1]
    assert d % 2 == 0, d
    lo = q[..., : d // 2].astype(jnp.int8)
    hi = q[..., d // 2 :].astype(jnp.int8)
    return (hi << 4) | (lo & 0x0F)


def _cache_zeros(shape, bits: int) -> jax.Array:
    if bits == 4:
        assert shape[-1] % 2 == 0, shape
        shape = shape[:-1] + (shape[-1] // 2,)
    return jnp.zeros(shape, jnp.int8)


def init_kv_cache(
    b: int, h_kv: int, max_len: int, head_dim: int, bits: int = 8
) -> QuantKVCache:
    """``bits=4`` stores the cache nibble-packed (2 channels per int8
    byte): half the HBM footprint AND roughly half the bandwidth-bound
    decode read time, at ±7 quantization levels (see bench_decode
    --bits 4 for the measured accuracy/latency trade)."""
    assert bits in (8, 4), bits
    return QuantKVCache(
        k_i8=_cache_zeros((b, h_kv, max_len, head_dim), bits),
        k_scale=jnp.full((b, h_kv, max_len), 1e-30, jnp.float32),
        v_i8=_cache_zeros((b, h_kv, max_len, head_dim), bits),
        v_scale=jnp.full((b, h_kv, max_len), 1e-30, jnp.float32),
        k_mean=jnp.zeros((b, h_kv, 1, head_dim), jnp.float32),
        v_mean=jnp.zeros((b, h_kv, 1, head_dim), jnp.float32),
    )


@jax.jit
def calibrate(cache, k_sample: jax.Array, v_sample: jax.Array,
              lengths: jax.Array | None = None):
    """Freeze per-channel K/V means from sample tokens [b, h_kv, t, d]
    (typically the prompt, before the prefill append).  Subtracting a
    fixed channel mean rescues coarse quantizers (esp. ``bits=4``) from
    channel bias — the corrections are mathematically free (see
    QuantKVCache).  Works on QuantKVCache and PagedKVCache alike; must
    run on an EMPTY cache — already-cached tokens were quantized
    against the OLD means, and mixing means across keys breaks the
    softmax invariance of the K shift.  Pass ``lengths`` to enforce
    that per batch under jit: rows with lengths > 0 keep their frozen
    means (so a re-prefill over a live cache is a no-op, not silent
    corruption)."""
    k_m = jnp.mean(k_sample.astype(jnp.float32), axis=2, keepdims=True)
    v_m = jnp.mean(v_sample.astype(jnp.float32), axis=2, keepdims=True)
    if lengths is not None:
        empty = (lengths.astype(jnp.int32) == 0)[:, None, None, None]
        k_m = jnp.where(empty, k_m, cache.k_mean)
        v_m = jnp.where(empty, v_m, cache.v_mean)
    return dataclasses.replace(cache, k_mean=k_m, v_mean=v_m)


def _quant_rows(x: jax.Array, bits: int = 8):
    """Per-token (row) int8 / packed-4-bit quantization of [b, h, t, d].
    ``bits=4`` returns [..., d/2] int8 with two channels per byte
    (``_pack_nibbles``)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    qmax = 127.0 if bits == 8 else 7.0
    scale, r = quant_mod.inv_scale(amax, qmax)
    q = jnp.clip(
        quant_mod.round_half_away(xf * r[..., None]), -qmax, qmax
    ).astype(jnp.int8)
    if bits == 4:
        q = _pack_nibbles(q)
    return q, scale


def quant_calibrated(x: jax.Array, mean: jax.Array, bits: int):
    """THE cache-write quantization recipe (every append/prefill path,
    dense/paged/sharded, uses exactly this): fp32 cast, subtract the
    frozen per-channel mean, per-token int8/int4 rows."""
    return _quant_rows(x.astype(jnp.float32) - mean, bits)


@jax.jit
def _vmean_addback(o: jax.Array, lengths: jax.Array,
                   v_mean: jax.Array) -> jax.Array:
    """Exact V-mean add-back (softmax rows sum to 1); K's mean shift is
    softmax-invariant and needs no correction.  Zero-length slots have
    no softmax mass (the kernel emits 0 rows) — keep them 0, not mean.
    Shared by every decode wrapper so the empty-slot invariant (and the
    merge-commutativity it protects) cannot desynchronize."""
    group = o.shape[1] // v_mean.shape[1]
    live = (lengths.astype(jnp.int32) > 0)[:, None, None, None]
    vm = jnp.where(live, jnp.repeat(v_mean, group, axis=1), 0.0)
    return o + vm.astype(o.dtype)


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
    k_q, k_s = quant_calibrated(k_new, cache.k_mean, cache.bits)
    v_q, v_s = quant_calibrated(v_new, cache.v_mean, cache.bits)

    def upd4(buf, new, off):
        return jax.lax.dynamic_update_slice(buf, new, (0, off, 0))

    def upd3(buf, new, off):
        return jax.lax.dynamic_update_slice(buf, new, (0, off))

    cache = dataclasses.replace(
        cache,
        k_i8=jax.vmap(upd4)(cache.k_i8, k_q, lengths),
        k_scale=jax.vmap(upd3)(cache.k_scale, k_s, lengths),
        v_i8=jax.vmap(upd4)(cache.v_i8, v_q, lengths),
        v_scale=jax.vmap(upd3)(cache.v_scale, v_s, lengths),
    )
    return cache, lengths + k_new.shape[2]


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "window", "return_state", "interpret"),
)
def sageattn_decode(
    q: jax.Array,            # [b, hq, t_q, d]
    cache: QuantKVCache,
    lengths: jax.Array,      # [b] int32 live lengths INCLUDING the new
                             # tokens q corresponds to
    *,
    sm_scale: float | None = None,
    window: int | None = None,
    return_state: bool = False,
    interpret: bool = False,
):
    """Decode attention of the current query tokens against the cache.

    The caller appends the step's K/V first (append_kv), then calls this
    with the updated lengths; with t_q > 1 the causal tail applies
    within the new tokens (speculative / chunked decode).  ``window``
    (Mistral/Gemma-style sliding window): each query attends only its
    last ``window`` keys, and the kernel reads only the cache chunks the
    window reaches — per-step cost O(window) at any context length.

    ``return_state=True`` returns ``(o, m, l)`` — the softmax merge
    state for combining partial decodes over disjoint cache shards
    (``decode_pallas.merge_decode_partials`` / ``parallel.decode``).
    The V-mean add-back commutes with the merge (weights sum to one),
    so calibrated shards combine exactly too."""
    res = decode_pallas.sage_decode_attention(
        q,
        cache.k_i8,
        cache.k_scale,
        cache.v_i8,
        cache.v_scale,
        lengths,
        sm_scale=sm_scale,
        window=window,
        return_state=return_state,
        interpret=interpret or jax.default_backend() == "cpu",
    )
    o = res[0] if return_state else res
    o = _vmean_addback(o, lengths, cache.v_mean)
    return (o, res[1], res[2]) if return_state else o


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
    k_mean: jax.Array
    v_mean: jax.Array

    @property
    def page_size(self) -> int:
        return self.pages_k.shape[2]

    @property
    def bits(self) -> int:
        return 4 if self.pages_k.shape[-1] != self.k_mean.shape[-1] else 8


def init_paged_kv_cache(
    num_pages: int, h_kv: int, head_dim: int, page_table: jax.Array,
    page_size: int = 1024, bits: int = 8,
) -> PagedKVCache:
    assert bits in (8, 4), bits
    b = page_table.shape[0]
    return PagedKVCache(
        pages_k=_cache_zeros((num_pages, h_kv, page_size, head_dim),
                             bits),
        pages_k_scale=jnp.full((num_pages, h_kv, page_size), 1e-30,
                               jnp.float32),
        pages_v=_cache_zeros((num_pages, h_kv, page_size, head_dim),
                             bits),
        pages_v_scale=jnp.full((num_pages, h_kv, page_size), 1e-30,
                               jnp.float32),
        page_table=page_table.astype(jnp.int32),
        k_mean=jnp.zeros((b, h_kv, 1, head_dim), jnp.float32),
        v_mean=jnp.zeros((b, h_kv, 1, head_dim), jnp.float32),
    )


@jax.jit
def paged_append(
    cache: PagedKVCache,
    lengths: jax.Array,      # [b]
    k_new: jax.Array,        # [b, h_kv, t, d]
    v_new: jax.Array,        # [b, h_kv, t, d]
    pool_start: jax.Array | int = 0,
) -> tuple[PagedKVCache, jax.Array]:
    """Quantize and write ``t`` tokens per sequence at ``lengths``,
    following the page table across page boundaries.  Pure quantized
    writes (per-token scales), like the dense append.

    ``pool_start``: when the page pool is SHARDED over devices
    (parallel/decode.py), each shard passes its first global page id;
    page-table entries resolve to pool-local indices and writes to
    pages another shard owns drop (scatter mode="drop") — every token
    lands on exactly one shard, bit-identically to the global pool."""
    page = cache.page_size
    k_q, k_s = quant_calibrated(k_new, cache.k_mean, cache.bits)
    v_q, v_s = quant_calibrated(v_new, cache.v_mean, cache.bits)
    # [b,h,t,d], [b,h,t]
    b, h, t, d = k_q.shape

    # destination of token j of sequence i: physical page
    # page_table[i, (lengths[i]+j)//page], row (lengths[i]+j) % page.
    # Appends past the table's span clamp to the end and overwrite the
    # tail — the same dynamic-update-slice semantics as append_kv (the
    # caller owns capacity); without the clamp the write would silently
    # drop while lengths still advanced.
    span = cache.page_table.shape[1] * page
    start = jnp.minimum(lengths, span - t)
    pos = start[:, None] + jnp.arange(t)[None, :]          # [b, t]
    phys = jnp.take_along_axis(
        cache.page_table, pos // page, axis=1
    ) - pool_start                                         # [b, t]
    # negative (another shard's) indices would WRAP under numpy
    # semantics — push them out of range so mode="drop" drops them
    phys = jnp.where(phys < 0, cache.pages_k.shape[0], phys)
    off = pos % page                                        # [b, t]

    def scatter_pool(pool, rows):
        # pool [P, h, page, d?]; rows [b, h, t, (d)] -> scatter (b*t) rows
        rows_flat = jnp.moveaxis(rows, 1, 2).reshape(
            (b * t, h) + rows.shape[3:]
        )  # [(b t), h, d?]
        return pool.at[phys.reshape(-1), :, off.reshape(-1)].set(
            rows_flat, mode="drop"
        )

    cache = dataclasses.replace(
        cache,
        pages_k=scatter_pool(cache.pages_k, k_q),
        pages_k_scale=scatter_pool(cache.pages_k_scale, k_s),
        pages_v=scatter_pool(cache.pages_v, v_q),
        pages_v_scale=scatter_pool(cache.pages_v_scale, v_s),
    )
    return cache, lengths + t


@jax.jit
def paged_prefill(
    cache: PagedKVCache,
    k: jax.Array,            # [b, h_kv, t, d], t a multiple of page_size
    v: jax.Array,
    pool_start: jax.Array | int = 0,
) -> tuple[PagedKVCache, jax.Array]:
    """Bulk-load empty sequences: writes whole pages through the page
    table (page-granular scatter — token-granular paged_append is for
    decode steps; a 32k-token prefill would otherwise scatter 32k rows).
    Requires t % page_size == 0 and empty sequences."""
    page = cache.page_size
    b, h, t, _ = k.shape
    assert t % page == 0, (t, page)
    n_used = t // page
    k_q, k_s = quant_calibrated(k, cache.k_mean, cache.bits)
    v_q, v_s = quant_calibrated(v, cache.v_mean, cache.bits)

    ids = cache.page_table[:, :n_used].reshape(-1) - pool_start
    ids = jnp.where(ids < 0, cache.pages_k.shape[0], ids)

    def put(pool, rows, has_d):
        # rows [b, h, t, (d)] -> [b*n_used, h, page, (d)]; d here is the
        # STORED width (d/2 packed bytes for the 4-bit cache)
        if has_d:
            d = rows.shape[-1]
            r = rows.reshape(b, h, n_used, page, d)
            r = jnp.moveaxis(r, 2, 1).reshape(b * n_used, h, page, d)
        else:
            r = rows.reshape(b, h, n_used, page)
            r = jnp.moveaxis(r, 2, 1).reshape(b * n_used, h, page)
        return pool.at[ids].set(r, mode="drop")

    cache = dataclasses.replace(
        cache,
        pages_k=put(cache.pages_k, k_q, True),
        pages_k_scale=put(cache.pages_k_scale, k_s, False),
        pages_v=put(cache.pages_v, v_q, True),
        pages_v_scale=put(cache.pages_v_scale, v_s, False),
    )
    return cache, jnp.full((b,), t, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "window", "return_state", "interpret"),
)
def sageattn_paged_decode(
    q: jax.Array,            # [b, hq, t_q, d]
    cache: PagedKVCache,
    lengths: jax.Array,      # [b]
    *,
    owned: jax.Array | None = None,
    page_table: jax.Array | None = None,
    sm_scale: float | None = None,
    window: int | None = None,
    return_state: bool = False,
    interpret: bool = False,
):
    """Decode attention through the page table (scalar-prefetch gather;
    same query semantics as sageattn_decode, including ``window``:
    only the pages the sliding window reaches are read).

    ``owned``/``page_table``/``return_state``: the sharded-pool hooks —
    a LOCAL (forward-filled) page table overriding the cache's own, an
    ownership mask restricting which logical pages this shard
    contributes, and the (o, m, l) merge state for the exact
    cross-shard LSE reduce (see parallel/decode.py)."""
    from sageattention_tpu.ops import paged_decode_pallas

    res = paged_decode_pallas.sage_paged_decode_attention(
        q,
        cache.pages_k,
        cache.pages_k_scale,
        cache.pages_v,
        cache.pages_v_scale,
        cache.page_table if page_table is None else page_table,
        lengths,
        owned=owned,
        sm_scale=sm_scale,
        window=window,
        return_state=return_state,
        interpret=interpret or jax.default_backend() == "cpu",
    )
    o = res[0] if return_state else res
    o = _vmean_addback(o, lengths, cache.v_mean)
    return (o, res[1], res[2]) if return_state else o
