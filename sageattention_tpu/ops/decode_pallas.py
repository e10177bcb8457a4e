"""Decode attention over a quantized KV cache (Pallas / Mosaic).

Beyond the reference (which covers diffusion + LLM *prefill*): the
serving decode step.  Decode attention is HBM-bandwidth-bound on the
cache read, so the int8 cache is worth ~2x latency at long context on
top of halving the cache footprint (2x batch or context per chip).

Design — shaped for tiny query counts:

* The main fused kernel wastes decode work: its 128-row Q tiles would
  compute 128x the needed scores and VPU-bind the op.  This kernel packs
  the whole GQA group x the (few) query tokens into ONE sublane tile of
  ``rows = hq/hkv * t_q`` (padded to 8) per (b, kv_head) — for the
  common hq/hkv = 8, t_q = 1 decode that is exactly the 8-row minimum
  tile, so the VPU work per KV chunk is chunk x 8, far below the DMA
  bytes (chunk x d), and the op stays bandwidth-bound.
* K and V both carry **per-token scales** ([b, hkv, S]): cache appends
  are pure quantized writes — no chunk requantization, no clipping
  drift, no stale per-channel amax (the problem with per-channel V
  scales under appends).
* The V dequant folds into P *before* the PV matmul: pv = (p * vs) @
  v_i8, and (p * vs) is requantized per ROW to int8 so the PV dot runs
  int8 x int8 with no in-register V cast (V bytes stream straight from
  HBM to the MXU).  The row scale rides out of the dot as one multiply.
* Q is quantized in-register per row (same chain as the main kernel's
  in-kernel Q quant); lengths mask via iota against an SMEM scalar, and
  multi-token queries (speculative / chunked decode) get the causal
  tail mask.

No K-mean smoothing in cache mode: the mean drifts with appends, and
per-token scales are already the finest granularity (smoothing exists
to rescue coarse scales from channel bias).
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


def _chunk_divisor(S: int, cap: int) -> int:
    """Chunk width for a cache of length ``S`` under the cap: ``S``
    itself when it fits (block dims == array dims, any length), else the
    largest divisor that is a multiple of 128 (the lane width the scale
    BlockSpecs tile by).  The old power-of-two halving fallback could
    silently degrade to sub-128 chunks for non-power-of-two lengths —
    fail loudly instead."""
    if S <= cap:
        return S
    c = cap // 128 * 128
    while c > 128 and S % c:
        c -= 128
    if S % c:
        raise ValueError(
            f"cache length {S} larger than the chunk cap {cap} must have "
            "a 128-multiple divisor (size max_len up to a multiple of 128)"
        )
    return c


def _bitcast_int4_tokens(packed: jax.Array, interpret: bool) -> jax.Array:
    """[t/2, d] token-pair-packed int8 -> [t, d] int4 view, natural
    token order.  On hardware this is ``pltpu.bitcast`` — a FREE
    reinterpretation (the int4 sublane tiling is exactly the packed
    bytes' nibble order: even sublane = low nibble); no VPU unpack ever
    touches the cache bytes, which is what keeps the 4-bit decode
    bandwidth-bound (an elementwise unpack costs ~6 VPU passes per
    chunk vs ~0.65 us of DMA — measured 26x slower than int8 decode).
    Interpret mode (CPU tests) emulates the same semantics."""
    if not interpret:
        return pltpu.bitcast(packed, jnp.int4)
    # interpret mode (CPU tests): same values, int8 carrier — the XLA
    # CPU backend cannot run sub-byte dots
    x = packed.astype(jnp.int32)
    lo = (x << 28) >> 28
    hi = x >> 4
    t2, d = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(t2 * 2, d).astype(jnp.int8)


def _split_int4(x: jax.Array, interpret: bool):
    """Exact split of integers in [-119, 119] (fp32-held) into
    ``16*a + b`` with a, b in the int4 range [-8, 7]: the two-dot trick
    that runs int8-grade operands through the int4 MXU path against a
    bitcast 4-bit cache (dot(a, k4) * 16 + dot(b, k4), exact in int32).
    """
    a = jnp.floor((x + 8.0) * (1.0 / 16.0))
    b = x - 16.0 * a
    dt = jnp.int8 if interpret else jnp.int4
    return a.astype(jnp.int8).astype(dt), b.astype(jnp.int8).astype(dt)


def decode_step_body(
    q_ref, k_ref, ks_ref, v_ref, vs_ref, ml_scr, acc_scr,
    *, base_col, length, t_q: int, sm_fold: float,
    window: int | None = None, packed: bool = False,
    interpret: bool = False,
):
    """One KV chunk/page of the bandwidth-shaped decode step: in-register
    per-row Q quant, int8 QK^T, length (+ causal-tail) masking, online
    merge into the (m, l, acc) scratch, and the P*vs -> int8 PV dot.

    SHARED by the dense (_decode_kernel) and paged (_paged_kernel)
    kernels — one copy of the numerics, two block-index sources.
    ``base_col`` is the chunk's first global token index.  A fully
    masked chunk yields m_c == NEG_INIT exactly (sf is set to the
    finite sentinel, never -inf), so the merge stays NaN-free.

    ``packed``: the 4-bit cache.  K/V blocks arrive token-pair-packed
    at [chunk/2, d] (half the HBM bytes); the kernel views them as
    [chunk, d] int4 via one free bitcast and runs the dots on the int4
    MXU path.  Q (and the folded P) quantize to ±119 and split exactly
    into two int4 operands (``_split_int4``), so operand precision
    stays int8-grade — only the cache itself is 4-bit."""
    qb = q_ref[0, 0].astype(jnp.float32)            # [rows8, d]
    amax = jnp.max(jnp.abs(qb), axis=1)[:, None]
    q_qmax = 119.0 if packed else 127.0
    qscale, r = inv_scale(amax, q_qmax)
    q_int = jnp.clip(round_half_away(qb * r), -q_qmax, q_qmax)
    if packed:
        k4 = _bitcast_int4_tokens(k_ref[0, 0], interpret)  # [chunk, d]
        qa, qb4 = _split_int4(q_int, interpret)
        dims = (((1,), (1,)), ((), ()))
        s_i32 = (
            jax.lax.dot_general(
                qa, k4, dims, preferred_element_type=jnp.int32
            ) << 4
        ) + jax.lax.dot_general(
            qb4, k4, dims, preferred_element_type=jnp.int32
        )
    else:
        q_i8 = q_int.astype(jnp.int8)
        s_i32 = jax.lax.dot_general(
            q_i8, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [rows8, chunk]
    ks = ks_ref[0, 0, 0][None, :]                    # [1, chunk]
    sf = s_i32.astype(jnp.float32) * (qscale * sm_fold) * ks

    col = jax.lax.broadcasted_iota(jnp.int32, sf.shape, 1) + base_col
    valid = col < length
    if t_q > 1:
        # causal tail: query row (h, t) sees keys < length - t_q + 1 + t
        trow = jax.lax.broadcasted_iota(jnp.int32, sf.shape, 0) % t_q
        valid = jnp.logical_and(valid, col < length - (t_q - 1) + trow)
        if window is not None:
            # sliding window: row at position p sees keys > p - window
            valid = jnp.logical_and(
                valid, col > length - t_q + trow - window
            )
    elif window is not None:
        valid = jnp.logical_and(valid, col > length - 1 - window)
    sf = jnp.where(valid, sf, NEG_INIT)

    m_c = jnp.max(sf, axis=1)[:, None]
    p = jnp.where(valid, jnp.exp2(sf - m_c), 0.0)
    l_c = jnp.sum(p, axis=1)[:, None]

    # fold the per-token V scales into P, requantize per row, and run
    # the PV dot in integers (V streams HBM -> MXU uncast)
    pe = p * vs_ref[0, 0, 0][None, :]
    pmax = jnp.max(pe, axis=1)[:, None]
    p_qmax = 119.0 if packed else 127.0
    psc, pr = inv_scale(pmax, p_qmax)
    if packed:
        v4 = _bitcast_int4_tokens(v_ref[0, 0], interpret)  # [chunk, d]
        # clip before the int4 split (mirrors the Q-side clip): with
        # exact inv_scale arithmetic p_int <= 119, but one fp ulp above
        # would split to a = 8, which wraps to -8 in int4 and flips the
        # sign of the 16x-weighted operand (ADVICE r3)
        p_int = jnp.clip(round_half_away(pe * pr), 0.0, p_qmax)  # pe >= 0
        pa, pb = _split_int4(p_int, interpret)
        dims = (((1,), (0,)), ((), ()))
        pv = (
            (jax.lax.dot_general(
                pa, v4, dims, preferred_element_type=jnp.int32
            ) << 4)
            + jax.lax.dot_general(
                pb, v4, dims, preferred_element_type=jnp.int32
            )
        ).astype(jnp.float32) * psc
    else:
        p_q = round_half_away(pe * pr).astype(jnp.int8)    # pe >= 0
        pv = jax.lax.dot_general(
            p_q, v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * psc  # [rows8, d]

    m_prev = ml_scr[:, 0:1]
    m_next = jnp.maximum(m_prev, m_c)
    alpha = jnp.exp2(m_prev - m_next)
    w = jnp.exp2(m_c - m_next)
    ml_scr[:, 0:1] = m_next
    ml_scr[:, 1:2] = alpha * ml_scr[:, 1:2] + w * l_c
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv * w[:, :1]


def decode_init_scratch(ml_scr, acc_scr):
    ml_scr[...] = jnp.zeros_like(ml_scr)
    ml_scr[:, 0:1] = jnp.full_like(ml_scr[:, 0:1], NEG_INIT)
    acc_scr[...] = jnp.zeros_like(acc_scr)


def decode_epilogue(o_ref, ml_scr, acc_scr, out_dtype, ml_ref=None):
    l = ml_scr[:, 1:2]
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(out_dtype)
    if ml_ref is not None:
        # raw merge state (m lane 0, l lane 1): lets callers combine
        # partial decodes over cache shards exactly (LSE merge)
        ml_ref[0, 0] = ml_scr[...]

def _decode_kernel(
    last_ref,   # [b] int32 scalar-prefetch: last live chunk per batch
    q_ref,      # [1, 1, rows8, d] bf16/f32
    k_ref,      # [1, 1, chunk, d] int8
    ks_ref,     # [1, 1, 1, chunk] f32 per-token K scales
    v_ref,      # [1, 1, chunk, d] int8
    vs_ref,     # [1, 1, 1, chunk] f32 per-token V scales
    len_ref,    # [1, 1, 1] int32 in SMEM (this batch's live length)
    o_ref,      # [1, 1, rows8, d]
    *rest,      # [ml_ref if return_state,] ml_scr, acc_scr
    chunk: int,
    n_kv: int,
    t_q: int,
    sm_fold: float,  # sm_scale * log2e
    out_dtype,
    return_state: bool = False,
    packed: bool = False,
    interpret: bool = False,
):
    # last_ref drives the index maps only (they clamp dead chunks to the
    # last live one, so the pipeline elides their DMAs — a ragged batch
    # reads O(its length), not O(cache span)); compute here keys off the
    # RAW kv index so the clamped re-reads never enter the merge.
    del last_ref
    if return_state:
        ml_ref, ml_scr, acc_scr = rest
    else:
        (ml_scr, acc_scr), ml_ref = rest, None
    kv_idx = pl.program_id(2)
    length = len_ref[0, 0, 0]

    @pl.when(kv_idx == 0)
    def _init():
        decode_init_scratch(ml_scr, acc_scr)

    # skip chunks entirely beyond the live length
    @pl.when(kv_idx * chunk < length)
    def _body():
        decode_step_body(
            q_ref, k_ref, ks_ref, v_ref, vs_ref, ml_scr, acc_scr,
            base_col=kv_idx * chunk, length=length, t_q=t_q,
            sm_fold=sm_fold, packed=packed, interpret=interpret,
        )

    @pl.when(kv_idx == n_kv - 1)
    def _epilogue():
        decode_epilogue(o_ref, ml_scr, acc_scr, out_dtype, ml_ref)


def _decode_kernel_window(
    start_ref,  # [b] int32 scalar-prefetch: first live chunk per batch
    q_ref, k_ref, ks_ref, v_ref, vs_ref, len_ref, o_ref, *rest,
    chunk: int,
    n_live: int,
    t_q: int,
    sm_fold: float,
    window: int,
    out_dtype,
    return_state: bool = False,
    packed: bool = False,
    interpret: bool = False,
):
    """Sliding-window variant: the kv grid covers only the ``n_live``
    chunks that can intersect the window (index maps add the per-batch
    prefetched start chunk), so decode cost is O(window), not
    O(context) — the Mistral/Gemma serving shape.  The cache itself
    stays linear (O(context) footprint); only the read is windowed."""
    if return_state:
        ml_ref, ml_scr, acc_scr = rest
    else:
        (ml_scr, acc_scr), ml_ref = rest, None
    b_idx = pl.program_id(0)
    g_idx = pl.program_id(2)
    length = len_ref[0, 0, 0]
    kv_idx = start_ref[b_idx] + g_idx

    @pl.when(g_idx == 0)
    def _init():
        decode_init_scratch(ml_scr, acc_scr)

    @pl.when(kv_idx * chunk < length)
    def _body():
        decode_step_body(
            q_ref, k_ref, ks_ref, v_ref, vs_ref, ml_scr, acc_scr,
            base_col=kv_idx * chunk, length=length, t_q=t_q,
            sm_fold=sm_fold, window=window, packed=packed,
            interpret=interpret,
        )

    @pl.when(g_idx == n_live - 1)
    def _epilogue():
        decode_epilogue(o_ref, ml_scr, acc_scr, out_dtype, ml_ref)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "chunk", "window", "out_dtype",
                     "return_state", "interpret"),
)
def sage_decode_attention(
    q: jax.Array,          # [b, hq, t_q, d]
    k_i8: jax.Array,       # [b, hkv, S, d] int8
    k_scale: jax.Array,    # [b, hkv, S] f32 per token
    v_i8: jax.Array,       # [b, hkv, S, d] int8
    v_scale: jax.Array,    # [b, hkv, S] f32 per token
    lengths: jax.Array,    # [b] int32 live lengths; values OUTSIDE
                           # [0, S] are part of the contract (sequence-
                           # parallel shards pass local_len = len - off,
                           # negative on unreached shards and > S on
                           # fully-live ones) — do NOT clamp or assert
                           # them here; the masks handle both ends
    *,
    sm_scale: float | None = None,
    chunk: int = 4096,
    window: int | None = None,
    out_dtype=None,
    return_state: bool = False,
    interpret: bool = False,
):
    """Decode attention of a few query tokens against the int8 KV cache.

    Queries attend keys [0, length) per batch; with t_q > 1 the t-th
    query row additionally observes the causal tail (keys
    < length - t_q + 1 + t) — the speculative/chunked-decode contract.
    ``window``: sliding-window serving (each query position p attends
    keys in (p - window, p]); the kernel reads only the cache chunks
    intersecting the window, so the per-step cost is O(window)
    regardless of context length.  Returns [b, hq, t_q, d] in
    ``out_dtype`` (default q.dtype).

    ``return_state=True`` additionally returns the raw softmax merge
    state ``(m, l)`` (each [b, hq, t_q] f32, base-2 running max and
    exp-sum): partial decodes over disjoint cache shards combine
    exactly via ``merge_decode_partials`` — the sequence-parallel
    serving hook (each device decodes its shard of the cache, one
    cheap LSE merge reduces the partials).
    """
    b, hq, t_q, d = q.shape
    hkv, S = k_i8.shape[1], k_scale.shape[2]
    # token-pair-packed 4-bit cache: data token axis is S/2
    packed = k_i8.shape[2] != S
    assert k_i8.shape[2] in (S, S // 2), (k_i8.shape, S)
    assert k_i8.shape[-1] == d, (k_i8.shape, d)
    assert hq % hkv == 0
    group = hq // hkv
    if sm_scale is None:
        sm_scale = d**-0.5
    out_dtype = out_dtype or q.dtype

    rows = group * t_q
    rows8 = max(8, -(-rows // 8) * 8)

    # 4096-wide chunks measured fastest at 32k (733 GB/s effective cache
    # read vs 552 at 2048); below 2048 the per-chunk overheads dominate.
    # Chunked-prefill shapes (t_q in the hundreds — the vLLM "extend"
    # phase) scale the chunk down so the [rows8, chunk] fp32 score tile
    # stays within ~8 MB of VMEM.
    if rows8 > 128:
        budget = (8 * 2**20 // 4) // rows8
        # floor at the 128 lane width: huge extend blocks must shrink
        # the chunk below the perf sweet spot rather than blow VMEM
        chunk = min(chunk, max(128, 1 << (budget.bit_length() - 1)))
    chunk = _chunk_divisor(S, chunk)
    n_kv = S // chunk
    # pack (kv head group, query token) into the row tile, head-major
    q_pack = q.reshape(b, hkv, group, t_q, d).reshape(
        b, hkv, rows, d
    )
    if rows8 != rows:
        q_pack = jnp.pad(q_pack, ((0, 0), (0, 0), (0, rows8 - rows),
                                  (0, 0)))

    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=64 * 2**20,
    )
    scratch_shapes = [
        pltpu.VMEM((rows8, 128), jnp.float32),
        pltpu.VMEM((rows8, d), jnp.float32),
    ]
    operands = (
        q_pack,
        k_i8,
        k_scale.astype(jnp.float32)[:, :, None, :],
        v_i8,
        v_scale.astype(jnp.float32)[:, :, None, :],
        lengths.astype(jnp.int32)[:, None, None],
    )

    if window is not None:
        # the kv grid covers only the chunks the window can reach; the
        # per-batch start chunk rides in as a scalar-prefetch operand so
        # the index maps (and the kernel, identically) offset by it
        span = window + t_q - 1   # oldest key any query row can see
        # tighten the chunk to the window: with the full-cache 4096
        # sweet spot a small window would read up to `chunk` extra
        # tokens of slack; half-span chunks cap the overread at ~50%
        # (floor 1024 — narrower chunks pay per-step overheads)
        target = max(1024, 1 << max((span - 1).bit_length() - 1, 0))
        if chunk > target:
            chunk = _chunk_divisor(S, target)
            n_kv = S // chunk
        n_live = min(n_kv, -(-span // chunk) + 1)
        kblk = chunk // 2 if packed else chunk
        start = jnp.clip(
            (lengths.astype(jnp.int32) - span) // chunk, 0, n_kv - n_live
        )

        def kvm(ib, ih, ik, st):
            return (ib, ih, st[ib] + ik, 0)

        def ksm(ib, ih, ik, st):
            return (ib, ih, 0, st[ib] + ik)

        def qm(ib, ih, ik, st):
            return (ib, ih, 0, 0)

        out_specs = [pl.BlockSpec((1, 1, rows8, d), qm)]
        out_shape = [jax.ShapeDtypeStruct((b, hkv, rows8, d), out_dtype)]
        if return_state:
            out_specs.append(pl.BlockSpec((1, 1, rows8, 128), qm))
            out_shape.append(
                jax.ShapeDtypeStruct((b, hkv, rows8, 128), jnp.float32)
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hkv, n_live),
            in_specs=[
                pl.BlockSpec((1, 1, rows8, d), qm),
                pl.BlockSpec((1, 1, kblk, d), kvm),
                pl.BlockSpec((1, 1, 1, chunk), ksm),
                pl.BlockSpec((1, 1, kblk, d), kvm),
                pl.BlockSpec((1, 1, 1, chunk), ksm),
                pl.BlockSpec((1, 1, 1), lambda ib, ih, ik, st: (ib, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        res = pl.pallas_call(
            functools.partial(
                _decode_kernel_window, chunk=chunk, n_live=n_live,
                t_q=t_q, sm_fold=sm_scale * LOG2E, window=window,
                out_dtype=out_dtype, return_state=return_state,
                packed=packed, interpret=interpret,
            ),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=compiler_params,
            interpret=interpret,
        )(start, *operands)
        return _unpack(res, b, hq, hkv, group, t_q, d, rows, return_state)

    # per-batch last live chunk: dead chunks' index maps clamp to it, so
    # the grid pipeline elides their DMAs (repeat block index) — a short
    # sequence in a long cache reads O(length) bytes, not O(S).  Negative
    # / zero lengths (sharded local views) clamp to chunk 0.
    kblk = chunk // 2 if packed else chunk
    last_live = jnp.clip(
        -(-lengths.astype(jnp.int32) // chunk) - 1, 0, n_kv - 1
    )

    def kvm(ib, ih, ik, ll):
        return (ib, ih, jnp.minimum(ik, ll[ib]), 0)

    def ksm(ib, ih, ik, ll):
        return (ib, ih, 0, jnp.minimum(ik, ll[ib]))

    def qm(ib, ih, ik, ll):
        return (ib, ih, 0, 0)

    out_specs = [pl.BlockSpec((1, 1, rows8, d), qm)]
    out_shape = [jax.ShapeDtypeStruct((b, hkv, rows8, d), out_dtype)]
    if return_state:
        out_specs.append(pl.BlockSpec((1, 1, rows8, 128), qm))
        out_shape.append(
            jax.ShapeDtypeStruct((b, hkv, rows8, 128), jnp.float32)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, rows8, d), qm),
            pl.BlockSpec((1, 1, kblk, d), kvm),
            pl.BlockSpec((1, 1, 1, chunk), ksm),
            pl.BlockSpec((1, 1, kblk, d), kvm),
            pl.BlockSpec((1, 1, 1, chunk), ksm),
            pl.BlockSpec((1, 1, 1), lambda ib, ih, ik, ll: (ib, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    res = pl.pallas_call(
        functools.partial(
            _decode_kernel, chunk=chunk, n_kv=n_kv, t_q=t_q,
            sm_fold=sm_scale * LOG2E, out_dtype=out_dtype,
            return_state=return_state, packed=packed,
            interpret=interpret,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=compiler_params,
        interpret=interpret,
    )(last_live, *operands)
    return _unpack(res, b, hq, hkv, group, t_q, d, rows, return_state)


def _unpack(res, b, hq, hkv, group, t_q, d, rows, return_state):
    """Strip row padding, restore [b, hq, t_q, ...] layout; with state,
    split the (m, l) lanes out of the [rows8, 128] merge buffer."""
    def heads(x):
        return x[:, :, :rows].reshape(b, hkv, group, t_q, *x.shape[3:]
                                      ).reshape(b, hq, t_q, *x.shape[3:])

    if not return_state:
        return heads(res[0])
    o, ml = res
    return heads(o), heads(ml[..., 0]), heads(ml[..., 1])


def merge_decode_partials(o_parts, m_parts, l_parts, out_dtype=None):
    """Exactly combine normalized partial decodes over DISJOINT cache
    shards (``return_state=True`` outputs, stacked on a leading axis):
    o = sum_i w_i * o_i / sum_i w_i with w_i = l_i * 2^(m_i - max m).
    Empty shards (m = NEG_INIT, l = 0) contribute zero weight.  This is
    the LSE merge the ring forward uses, specialized to decode — the
    reduction for sequence-parallel serving (see parallel/decode.py)."""
    out_dtype = out_dtype or o_parts.dtype
    m_g = jnp.max(m_parts, axis=0)
    w = l_parts * jnp.exp2(m_parts - m_g)            # [n, b, hq, t_q]
    den = jnp.sum(w, axis=0)
    # a fully-empty row has den == 0 -> emit 0 like the kernel does
    # (an f32 subnormal epsilon would be flushed to 0 by XLA: NaN)
    den = jnp.where(den == 0.0, 1.0, den)
    num = jnp.sum(w[..., None] * o_parts.astype(jnp.float32), axis=0)
    return (num / den[..., None]).astype(out_dtype)
