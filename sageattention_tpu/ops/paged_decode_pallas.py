"""Paged decode attention over a quantized KV cache (Pallas / Mosaic).

The paged (vLLM-style) variant of ops/decode_pallas.py: the cache lives
in a pool of fixed-size PAGES shared by all sequences, and each
sequence's logical chunks map to arbitrary physical pages through a
page table.  The page lookup happens in the BlockSpec index maps via
scalar prefetch (``pltpu.PrefetchScalarGridSpec``) — the TPU-idiomatic
form of gather-by-page: the page table is available before the kernel
body runs, so each grid step DMAs exactly the physical page it needs,
and non-contiguous sequences stream at the same bandwidth as dense
ones.

TPU paging favors COARSE pages: the kernel processes one page per grid
step, and small pages pay per-step overheads (measured at 32k context,
scrambled physical pages, b4 hkv8 hd128: page 1024 = 419 GB/s, 2048 =
582, 4096 = 811 — matching the dense kernel's 757 at the same chunk
width, i.e. page indirection is FREE at coarse pages).  Unlike GPU
vLLM's 16-64-token pages (which fight a fragmentation problem the much
larger HBM here tolerates), pick 2048-4096-token pages and spend the
slack on capacity.

Everything else matches the dense decode kernel: per-token K/V scales
(appends are pure writes), GQA group packed into the 8-row sublane
tile, V dequant folded into P with a per-row int8 requantization so the
PV dot runs int8 x int8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sageattention_tpu.ops.decode_pallas import (
    LOG2E,  # one source of truth for the base-2 fold
    decode_epilogue,
    decode_init_scratch,
    decode_step_body,
)


def _paged_kernel(
    pt_ref,     # [b, max_pages] int32 scalar-prefetch page table
    len_ref,    # [b] int32 scalar-prefetch live lengths
    *rest,      # [owned_ref,] q, then PAIR x (k/ks/v/vs) refs, o_ref,
                # [ml_ref,] ml_scr, acc_scr
    page: int,
    n_pages: int,
    t_q: int,
    sm_fold: float,
    out_dtype,
    pair: int = 1,
    has_owned: bool = False,
    return_state: bool = False,
    packed: bool = False,
    interpret: bool = False,
):
    """The page-table variant of decode_pallas._decode_kernel: identical
    numerics (the shared decode_step_body), with the KV block coming
    from the physical page the index maps selected via scalar prefetch
    and the length read from the prefetched scalar array.

    ``pair``: logical pages processed per grid step (the pool operands
    ride ``pair`` times with offset index maps).  The indirection's cost
    is per-STEP, not per-byte — pairing pages halves the grid depth so
    the paged walk amortizes its step overheads like the dense kernel's
    wider chunks do (the r4 0.82x-of-dense gap was exactly this).

    ``has_owned``: a [b, max_pages] int32 scalar-prefetch mask marks
    which logical pages THIS shard of a sequence-sharded page pool
    owns; unowned steps skip compute (their index maps repeat the
    previous physical page, so the pipeline elides the DMA too).
    ``return_state``: emit the raw (m, l) merge buffer for the exact
    cross-shard LSE merge (parallel/decode.py)."""
    owned_ref, rest = (rest[0], rest[1:]) if has_owned else (None, rest)
    q_ref = rest[0]
    kv_refs = rest[1:1 + 4 * pair]
    o_ref = rest[1 + 4 * pair]
    tail = rest[2 + 4 * pair:]
    if return_state:
        ml_ref, ml_scr, acc_scr = tail
    else:
        (ml_scr, acc_scr), ml_ref = tail, None
    b_idx = pl.program_id(0)
    g_idx = pl.program_id(2)
    length = len_ref[b_idx]

    @pl.when(g_idx == 0)
    def _init():
        decode_init_scratch(ml_scr, acc_scr)

    for h in range(pair):
        p_idx = g_idx * pair + h
        k_ref, ks_ref, v_ref, vs_ref = kv_refs[4 * h:4 * h + 4]
        live = p_idx * page < length
        if owned_ref is not None:
            live = jnp.logical_and(live, owned_ref[b_idx, p_idx] != 0)

        @pl.when(live)
        def _body(k_ref=k_ref, ks_ref=ks_ref, v_ref=v_ref,
                  vs_ref=vs_ref, p_idx=p_idx):
            decode_step_body(
                q_ref, k_ref, ks_ref, v_ref, vs_ref, ml_scr, acc_scr,
                base_col=p_idx * page, length=length, t_q=t_q,
                sm_fold=sm_fold, packed=packed, interpret=interpret,
            )

    @pl.when(g_idx == n_pages // pair - 1)
    def _epilogue():
        decode_epilogue(o_ref, ml_scr, acc_scr, out_dtype, ml_ref)


def _paged_kernel_window(
    pt_ref,     # [b, max_pages] int32 scalar-prefetch page table
    len_ref,    # [b] int32 scalar-prefetch live lengths
    start_ref,  # [b] int32 scalar-prefetch first live logical page
    *rest,
    page: int,
    n_live: int,
    t_q: int,
    sm_fold: float,
    window: int,
    out_dtype,
    has_owned: bool = False,
    return_state: bool = False,
    packed: bool = False,
    interpret: bool = False,
):
    """Sliding-window paged decode: the grid covers only the ``n_live``
    logical pages the window can reach (the index maps gather
    ``pt[b, start[b] + g]``) — O(window) per step at any context."""
    owned_ref, rest = (rest[0], rest[1:]) if has_owned else (None, rest)
    q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref = rest[:6]
    if return_state:
        ml_ref, ml_scr, acc_scr = rest[6:]
    else:
        (ml_scr, acc_scr), ml_ref = rest[6:], None
    b_idx = pl.program_id(0)
    g_idx = pl.program_id(2)
    length = len_ref[b_idx]
    p_idx = start_ref[b_idx] + g_idx

    @pl.when(g_idx == 0)
    def _init():
        decode_init_scratch(ml_scr, acc_scr)

    live = p_idx * page < length
    if owned_ref is not None:
        live = jnp.logical_and(live, owned_ref[b_idx, p_idx] != 0)

    @pl.when(live)
    def _body():
        decode_step_body(
            q_ref, k_ref, ks_ref, v_ref, vs_ref, ml_scr, acc_scr,
            base_col=p_idx * page, length=length, t_q=t_q,
            sm_fold=sm_fold, window=window, packed=packed,
            interpret=interpret,
        )

    @pl.when(g_idx == n_live - 1)
    def _epilogue():
        decode_epilogue(o_ref, ml_scr, acc_scr, out_dtype, ml_ref)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "window", "out_dtype", "return_state",
                     "interpret"),
)
def sage_paged_decode_attention(
    q: jax.Array,            # [b, hq, t_q, d]
    pages_k: jax.Array,      # [num_pages, hkv, page, d] int8
    pages_k_scale: jax.Array,  # [num_pages, hkv, page] f32
    pages_v: jax.Array,      # [num_pages, hkv, page, d] int8
    pages_v_scale: jax.Array,  # [num_pages, hkv, page] f32
    page_table: jax.Array,   # [b, max_pages] int32 physical page ids
    lengths: jax.Array,      # [b] int32 live token counts
    *,
    owned: jax.Array | None = None,  # [b, max_pages] int32 page mask
    sm_scale: float | None = None,
    window: int | None = None,
    out_dtype=None,
    return_state: bool = False,
    interpret: bool = False,
):
    """Decode attention through a page table.

    Logical chunk j of sequence b lives in physical page
    ``page_table[b, j]``; entries past the live length may be anything
    valid (they are DMA'd but masked).  Same query semantics as the
    dense decode kernel (t_q causal tail, GQA packing).  ``window``
    clips both the mask and the page reads to the sliding window —
    O(window) pages per step at any context length.

    ``owned`` (with ``return_state=True``) runs a PARTIAL decode over a
    shard of a distributed page pool: only logical pages with
    ``owned[b, j] != 0`` contribute; the caller passes a LOCAL page
    table whose unowned entries repeat the previous owned physical page
    (forward-fill), which makes the pipeline skip their DMAs entirely —
    unowned grid steps cost neither bandwidth nor compute.  Partials
    merge exactly via ``decode_pallas.merge_decode_partials``."""
    if owned is not None and not return_state:
        # a normalized shard partial is indistinguishable from a full
        # decode output — refuse the silent footgun
        raise ValueError(
            "owned= runs a PARTIAL decode over a pool shard; it requires "
            "return_state=True so the caller can merge the partials "
            "(decode_pallas.merge_decode_partials)"
        )
    b, hq, t_q, d = q.shape
    num_pages, hkv = pages_k.shape[:2]
    page = pages_k_scale.shape[2]
    # token-pair-packed 4-bit pool: data token axis is page/2
    packed = pages_k.shape[2] != page
    assert pages_k.shape[2] in (page, page // 2), (pages_k.shape, page)
    assert pages_k.shape[-1] == d, (pages_k.shape, d)
    kblk = page // 2 if packed else page
    max_pages = page_table.shape[1]
    assert hq % hkv == 0
    group = hq // hkv
    if sm_scale is None:
        sm_scale = d**-0.5
    out_dtype = out_dtype or q.dtype

    rows = group * t_q
    rows8 = max(8, -(-rows // 8) * 8)
    # the paged block width IS the page size (pages can't be split at
    # read time), so large extend blocks must bound the score tile
    # explicitly — fail loud instead of blowing Mosaic's VMEM budget
    if rows8 * page * 4 > 8 * 2**20:
        raise ValueError(
            f"paged chunked-prefill tile too large: rows {rows8} x page "
            f"{page} exceeds the ~8 MB score-tile budget; use smaller "
            f"extend blocks (t_q <= {8 * 2**20 // (4 * page * group)}) "
            f"or smaller pages, or the dense-cache path (its chunk "
            f"width adapts to t_q)"
        )
    q_pack = q.reshape(b, hkv, rows, d)
    if rows8 != rows:
        q_pack = jnp.pad(
            q_pack, ((0, 0), (0, 0), (0, rows8 - rows), (0, 0))
        )

    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=64 * 2**20,
    )
    scratch_shapes = [
        pltpu.VMEM((rows8, 128), jnp.float32),
        pltpu.VMEM((rows8, d), jnp.float32),
    ]
    pool_operands = (
        q_pack,
        pages_k,
        pages_k_scale.astype(jnp.float32)[:, :, None, :],
        pages_v,
        pages_v_scale.astype(jnp.float32)[:, :, None, :],
    )

    has_owned = owned is not None

    def finish(res):
        from sageattention_tpu.ops.decode_pallas import _unpack

        return _unpack(res, b, hq, hkv, group, t_q, d, rows,
                       return_state)

    if window is not None:
        span = window + t_q - 1
        n_live = min(max_pages, -(-span // page) + 1)
        start = jnp.clip(
            (lengths.astype(jnp.int32) - span) // page,
            0, max_pages - n_live,
        )

        # index maps receive (grid indices..., scalar-prefetch refs...);
        # the optional owned mask is the LAST prefetch operand
        def page_map_w(ib, ih, ip, pt, lens, st, *own):
            return (pt[ib, st[ib] + ip], ih, 0, 0)

        def q_map_w(ib, ih, ip, pt, lens, st, *own):
            return (ib, ih, 0, 0)

        out_specs = [pl.BlockSpec((1, 1, rows8, d), q_map_w)]
        out_shape = [jax.ShapeDtypeStruct((b, hkv, rows8, d), out_dtype)]
        if return_state:
            out_specs.append(pl.BlockSpec((1, 1, rows8, 128), q_map_w))
            out_shape.append(
                jax.ShapeDtypeStruct((b, hkv, rows8, 128), jnp.float32)
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3 + has_owned,
            grid=(b, hkv, n_live),
            in_specs=[
                pl.BlockSpec((1, 1, rows8, d), q_map_w),
                pl.BlockSpec((1, 1, kblk, d), page_map_w),
                pl.BlockSpec((1, 1, 1, page), page_map_w),
                pl.BlockSpec((1, 1, kblk, d), page_map_w),
                pl.BlockSpec((1, 1, 1, page), page_map_w),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        # kernel scalar refs arrive in operand order: pt, lens, start
        # [, owned]; _paged_kernel_window expects owned FIRST in *rest,
        # so reorder is unnecessary — it slices rest by has_owned
        prefetch = [
            page_table.astype(jnp.int32),
            lengths.astype(jnp.int32),
            start,
        ]
        if has_owned:
            prefetch.append(owned.astype(jnp.int32))
        res = pl.pallas_call(
            functools.partial(
                _paged_kernel_window, page=page, n_live=n_live, t_q=t_q,
                sm_fold=sm_scale * LOG2E, window=window,
                out_dtype=out_dtype, has_owned=has_owned,
                return_state=return_state, packed=packed,
                interpret=interpret,
            ),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=compiler_params,
            interpret=interpret,
        )(*prefetch, *pool_operands)
        return finish(res)

    # PAIRED page walk: the per-grid-step overhead (not the scrambled
    # DMA itself) is what cost the r4 paged path its 18% vs dense — two
    # pages per step halves the grid depth, matching the dense kernel's
    # wider chunks.  The pool operands ride once per pair member with
    # offset index maps.
    pair = 2 if (max_pages % 2 == 0 and max_pages >= 4) else 1

    def q_map(ib, ih, ip, pt, lens, *own):
        return (ib, ih, 0, 0)

    def page_map_h(h):
        def m(ib, ih, ip, pt, lens, *own):
            lp = ip * pair + h
            # clamp dead logical pages to the last LIVE one: repeated
            # physical indices elide their DMAs in the pipeline (their
            # compute is already skipped by the kernel's live gate)
            last = jnp.maximum((lens[ib] - 1) // page, 0)
            return (pt[ib, jnp.minimum(lp, last)], ih, 0, 0)
        return m

    out_specs = [pl.BlockSpec((1, 1, rows8, d), q_map)]
    out_shape = [jax.ShapeDtypeStruct((b, hkv, rows8, d), out_dtype)]
    if return_state:
        out_specs.append(pl.BlockSpec((1, 1, rows8, 128), q_map))
        out_shape.append(
            jax.ShapeDtypeStruct((b, hkv, rows8, 128), jnp.float32)
        )
    in_specs = [pl.BlockSpec((1, 1, rows8, d), q_map)]
    pool_in = [q_pack]
    for h in range(pair):
        pm = page_map_h(h)
        in_specs += [
            pl.BlockSpec((1, 1, kblk, d), pm),
            pl.BlockSpec((1, 1, 1, page), pm),
            pl.BlockSpec((1, 1, kblk, d), pm),
            pl.BlockSpec((1, 1, 1, page), pm),
        ]
        pool_in += list(pool_operands[1:])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + has_owned,
        grid=(b, hkv, max_pages // pair),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    prefetch = [page_table.astype(jnp.int32), lengths.astype(jnp.int32)]
    if has_owned:
        prefetch.append(owned.astype(jnp.int32))
    res = pl.pallas_call(
        functools.partial(
            _paged_kernel, page=page, n_pages=max_pages, t_q=t_q,
            sm_fold=sm_scale * LOG2E, out_dtype=out_dtype, pair=pair,
            has_owned=has_owned, return_state=return_state,
            packed=packed, interpret=interpret,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*prefetch, *pool_in)
    return finish(res)
