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

from sageattention_tpu.quant import inv_scale, round_half_away

LOG2E = 1.4426950408889634
NEG_INIT = -1e30


def _paged_kernel(
    pt_ref,     # [b, max_pages] int32 scalar-prefetch page table
    len_ref,    # [b] int32 scalar-prefetch live lengths
    q_ref,      # [1, 1, rows8, d]
    k_ref,      # [1, 1, page, d] int8 (the physical page)
    ks_ref,     # [1, 1, 1, page] f32
    v_ref,      # [1, 1, page, d] int8
    vs_ref,     # [1, 1, 1, page] f32
    o_ref,      # [1, 1, rows8, d]
    ml_scr,
    acc_scr,
    *,
    page: int,
    n_pages: int,
    t_q: int,
    sm_fold: float,
    out_dtype,
):
    b_idx = pl.program_id(0)
    p_idx = pl.program_id(2)
    length = len_ref[b_idx]

    @pl.when(p_idx == 0)
    def _init():
        ml_scr[...] = jnp.zeros_like(ml_scr)
        ml_scr[:, 0:1] = jnp.full_like(ml_scr[:, 0:1], NEG_INIT)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(p_idx * page < length)
    def _body():
        qb = q_ref[0, 0].astype(jnp.float32)
        amax = jnp.max(jnp.abs(qb), axis=1)[:, None]
        qscale, r = inv_scale(amax, 127.0)
        q_i8 = jnp.clip(round_half_away(qb * r), -127, 127).astype(
            jnp.int8
        )
        s_i32 = jax.lax.dot_general(
            q_i8, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        ks = ks_ref[0, 0, 0][None, :]
        sf = s_i32.astype(jnp.float32) * (qscale * sm_fold) * ks

        col = jax.lax.broadcasted_iota(jnp.int32, sf.shape, 1) + (
            p_idx * page
        )
        valid = col < length
        if t_q > 1:
            trow = jax.lax.broadcasted_iota(jnp.int32, sf.shape, 0) % t_q
            valid = jnp.logical_and(
                valid, col < length - (t_q - 1) + trow
            )
        sf = jnp.where(valid, sf, NEG_INIT)

        m_c = jnp.max(sf, axis=1)[:, None]
        p = jnp.where(valid, jnp.exp2(sf - m_c), 0.0)
        l_c = jnp.sum(p, axis=1)[:, None]

        pe = p * vs_ref[0, 0, 0][None, :]
        pmax = jnp.max(pe, axis=1)[:, None]
        psc, pr = inv_scale(pmax, 127.0)
        p_q = (pe * pr + 0.5).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_q, v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * psc

        m_prev = ml_scr[:, 0:1]
        m_next = jnp.maximum(m_prev, m_c)
        alpha = jnp.exp2(m_prev - m_next)
        w = jnp.exp2(m_c - m_next)
        ml_scr[:, 0:1] = m_next
        ml_scr[:, 1:2] = alpha * ml_scr[:, 1:2] + w * l_c
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv * w[:, :1]

    @pl.when(p_idx == n_pages - 1)
    def _epilogue():
        l = ml_scr[:, 1:2]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "out_dtype", "interpret"),
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
    sm_scale: float | None = None,
    out_dtype=None,
    interpret: bool = False,
):
    """Decode attention through a page table.

    Logical chunk j of sequence b lives in physical page
    ``page_table[b, j]``; entries past the live length may be anything
    valid (they are DMA'd but masked).  Same query semantics as the
    dense decode kernel (t_q causal tail, GQA packing)."""
    b, hq, t_q, d = q.shape
    num_pages, hkv, page, _ = pages_k.shape
    max_pages = page_table.shape[1]
    assert hq % hkv == 0
    group = hq // hkv
    if sm_scale is None:
        sm_scale = d**-0.5
    out_dtype = out_dtype or q.dtype

    rows = group * t_q
    rows8 = max(8, -(-rows // 8) * 8)
    q_pack = q.reshape(b, hkv, rows, d)
    if rows8 != rows:
        q_pack = jnp.pad(
            q_pack, ((0, 0), (0, 0), (0, rows8 - rows), (0, 0))
        )

    # index maps receive (grid indices..., scalar-prefetch refs...)
    def page_map(ib, ih, ip, pt, lens):
        return (pt[ib, ip], ih, 0, 0)

    def q_map(ib, ih, ip, pt, lens):
        return (ib, ih, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, max_pages),
        in_specs=[
            pl.BlockSpec((1, 1, rows8, d), q_map),
            pl.BlockSpec((1, 1, page, d), page_map),
            pl.BlockSpec((1, 1, 1, page), page_map),
            pl.BlockSpec((1, 1, page, d), page_map),
            pl.BlockSpec((1, 1, 1, page), page_map),
        ],
        out_specs=pl.BlockSpec((1, 1, rows8, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((rows8, 128), jnp.float32),
            pltpu.VMEM((rows8, d), jnp.float32),
        ],
    )
    o = pl.pallas_call(
        functools.partial(
            _paged_kernel, page=page, n_pages=max_pages, t_q=t_q,
            sm_fold=sm_scale * LOG2E, out_dtype=out_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows8, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(
        page_table.astype(jnp.int32),
        lengths.astype(jnp.int32),
        q_pack,
        pages_k,
        pages_k_scale.astype(jnp.float32)[:, :, None, :],
        pages_v,
        pages_v_scale.astype(jnp.float32)[:, :, None, :],
    )
    return o[:, :, :rows].reshape(b, hkv, group, t_q, d).reshape(
        b, hq, t_q, d
    )
