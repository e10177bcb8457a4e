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
* :func:`quant_v_per_channel` — per-channel amax (+ optional mean for
  smooth_v) and the scaled int8/fp8 cast in ONE kernel over the
  VMEM-resident sequence (reference: MeanScaleKernel, fused.cu:316-427).

Rows are independent, so the kernels flatten (b, h[, s]) into one grid
axis with large blocks — per-grid-step overhead, not bandwidth, dominates
these memory-bound passes at small block sizes (measured 10x).

The pure-JAX functions in ``sageattention_tpu.quant`` are the numerical
spec; these kernels must match them bit-exactly (tests/test_quant.py).
Shapes the fast layouts cannot express fall back to the jnp spec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sageattention_tpu import quant as quant_spec

# rows per grid step for the flattened per-row quantizer
_Q_ROWS = 16384
# VMEM budget for the single-pass whole-slab V quantizer: bytes of one
# (s, d) input slab.  Mosaic's stack allocator keeps ~12x the input slab
# live for the f32 temporaries (measured: a 2.2 MB slab allocates 25.9 MB
# scoped); with the vmem limit raised to 64 MB (the 16 MB default is a
# compiler limit, not the chip's — v5e runs 120 MB scratch), slabs to
# ~4 MB are safe single-pass.  Larger sequences take the blocked
# two-pass kernels below (same numerics; mean accumulation order differs
# at ULP level).
_V_VMEM_BYTES = 4 * 2**20
# input-slab bytes per grid step of the blocked V kernels
_V_BLOCK_BYTES = 512 * 2**10

_round_half_away = quant_spec.round_half_away
_inv_scale = quant_spec.inv_scale


# --------------------------------------------------------------------------
# Q: per-row scales over a flattened [rows, d] view
# --------------------------------------------------------------------------


def _quant_rows_kernel(q_ref, o_ref, s_ref, *, scale_fold, qmax):
    x = q_ref[...].astype(jnp.float32)  # [rows_blk, d]
    amax = jnp.max(jnp.abs(x), axis=1)[:, None]
    scale, r = _inv_scale(amax, qmax)
    # no clip: r = qmax/amax of these rows, |x*r| <= qmax + 2ulp
    o_ref[...] = _round_half_away(x * r).astype(jnp.int8)
    # dense 128-lane store of the per-row scales (a [rows, 1] store would
    # issue one masked lane per vector op — measured ~5x slower)
    s_ref[...] = (scale * scale_fold).reshape(s_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("scale_fold", "bits", "block_s", "interpret")
)
def quant_q_per_token(
    q: jax.Array,
    *,
    scale_fold: float = 1.0,
    bits: int = 8,
    block_s: int = _Q_ROWS,
    interpret: bool = False,
):
    """[b,h,s,d] -> (int8 [b,h,s,d], f32 scales [b,h,s]) in one fused pass."""
    b, h, s, d = q.shape
    qmax = 7.0 if bits == 4 else 127.0
    rows = b * h * s
    q2 = q.reshape(rows, d)
    # cap the block so one step's input slab stays ~4 MB
    max_rows = max(128, (4 * 2**20 // (d * q.dtype.itemsize)) // 128 * 128)
    blk = min(block_s, max_rows, -(-rows // 128) * 128)
    pad = (-rows) % blk
    if pad:
        # per-row scales: pad rows quantize independently, then crop
        q2 = jnp.pad(q2, ((0, pad), (0, 0)))
    n = q2.shape[0] // blk
    out, scale = pl.pallas_call(
        functools.partial(
            _quant_rows_kernel, scale_fold=scale_fold, qmax=qmax
        ),
        grid=(n,),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((blk // 128, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q2.shape[0], d), jnp.int8),
            jax.ShapeDtypeStruct((q2.shape[0] // 128, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(q2)
    return (
        out[:rows].reshape(b, h, s, d),
        scale.reshape(-1)[:rows].reshape(b, h, s),
    )


# --------------------------------------------------------------------------
# K: per-chunk scales, fused mean subtraction, group-major [groups, g, d]
# --------------------------------------------------------------------------


def _quant_k_kernel(k_ref, km_ref, o_ref, s_ref, *, qmax, smooth):
    i = pl.program_id(0)
    x = k_ref[...].astype(jnp.float32)  # [1, group, d]
    if smooth:
        x = x - km_ref[...]  # [1, 1, d]
    amax = jnp.max(jnp.abs(x))
    scale, r = _inv_scale(amax, qmax)
    # no clip: r = qmax/amax of this chunk, |x*r| <= qmax + 2ulp
    o_ref[...] = _round_half_away(x * r).astype(jnp.int8)
    s_ref[0, i] = scale


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
    if s % group:
        # ragged tail: keep the exact jnp spec (rare; unpadded odd shapes)
        if km is not None:
            ks = k.astype(jnp.float32) - km[..., None, :]
        else:
            ks = k
        return quant_spec.quant_int8_block_scales(ks, group=group, bits=bits)
    qmax = 7.0 if bits == 4 else 127.0
    smooth = km is not None
    n_groups = (b * h * s) // group
    k3 = k.reshape(n_groups, group, d)
    in_specs = [pl.BlockSpec((1, group, d), lambda i: (i, 0, 0))]
    inputs = [k3]
    if smooth:
        # the index map re-reads each (b,h) mean row for all its s//group
        # chunks — no repeated [n_groups,1,d] materialization in HBM
        gph = s // group  # groups per (b, h)
        km_g = km.astype(jnp.float32).reshape(b * h, 1, d)
        in_specs.append(pl.BlockSpec((1, 1, d), lambda i: (i // gph, 0, 0)))
        inputs.append(km_g)

    def kernel(*refs):
        if smooth:
            k_ref, km_ref, o_ref, s_ref = refs
        else:
            k_ref, o_ref, s_ref = refs
            km_ref = None
        _quant_k_kernel(k_ref, km_ref, o_ref, s_ref, qmax=qmax, smooth=smooth)

    out, scale = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, group, d), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (1, n_groups), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, group, d), jnp.int8),
            jax.ShapeDtypeStruct((1, n_groups), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(*inputs)
    return (
        out.reshape(b, h, s, d),
        scale[0].reshape(b, h, s // group),
    )


# --------------------------------------------------------------------------
# K: ONE-READ fused mean + per-chunk quantization (whole slab per step)
# --------------------------------------------------------------------------

# input-slab cap for the single-pass fused K quantizer (see _V_VMEM_BYTES
# on Mosaic's temporary-allocation multiplier)
_K_FUSED_BYTES = 4 * 2**20


def _quant_k_fused_kernel(
    k_ref, o_ref, s_ref, km_ref, *, qmax, group, n_chunks, smooth, slabs
):
    # ``slabs`` (b,h) rows per grid step: the chain is overhead-bound,
    # not bandwidth-bound, at one slab per step (measured 988 us for
    # b*h=128 4k/hd64 slabs ~ 7.7 us/step of which ~5 us is per-step
    # cost; batching slabs amortizes it)
    step_scales = []
    for g in range(slabs):
        x = k_ref[g].astype(jnp.float32)  # [s, d]
        if smooth:
            km = jnp.mean(x, axis=0, keepdims=True)  # [1, d]
            x = x - km
            km_ref[g] = km
        for c in range(n_chunks):
            rows = slice(c * group, (c + 1) * group)
            xc = x[rows, :]
            amax = jnp.max(jnp.abs(xc))
            scale, r = _inv_scale(amax, qmax)
            # no clip: r = qmax/amax of THIS data, so |xc*r| <=
            # qmax + 2ulp and round cannot reach qmax+1 (saves 2 of ~9
            # VPU passes on the prologue's critical path)
            o_ref[g, rows, :] = _round_half_away(xc * r).astype(jnp.int8)
            step_scales.append(scale)
    # one vector store per step into the (1, 1, slabs*n_chunks) VMEM
    # block (Mosaic rejects scalar stores to VMEM; SMEM whole-row
    # outputs would force sequential grid semantics)
    s_ref[0, 0, :] = jnp.stack(step_scales)


def _slabs_per_step(n_slabs: int, slab_bytes: int,
                    budget: int = _K_FUSED_BYTES) -> int:
    """Largest divisor of ``n_slabs`` whose combined input stays under
    ``budget`` (the whole-slab quantizers are per-grid-step-overhead
    bound at one slab per step: measured ~5 us/step fixed cost vs
    ~2.5 us of VPU work for a 4k/hd64 slab)."""
    cap = max(1, budget // max(1, slab_bytes))
    g = 1
    for cand in range(1, min(cap, n_slabs) + 1):
        if n_slabs % cand == 0:
            g = cand
    return g


def k_fused_eligible(s: int, d: int, group: int) -> bool:
    """Shapes the one-read fused K prologue handles (see fallback note
    in :func:`quant_k_fused_mean`)."""
    return s % group == 0 and s * d * 2 <= _K_FUSED_BYTES


@functools.partial(
    jax.jit, static_argnames=("group", "bits", "smooth", "interpret")
)
def quant_k_fused_mean(
    k: jax.Array,
    *,
    group: int,
    bits: int = 8,
    smooth: bool = True,
    interpret: bool = False,
):
    """ONE-pass K prologue: [b,h,s,d] -> (int8 [b,h,s,d], per-chunk
    scales [b,h,s/group], channel mean km [b,h,d] | None).

    Replaces the XLA ``k.mean`` pass + :func:`quant_k_chunked` (two HBM
    reads of K) with a single read: a whole (b, h) K slab is VMEM-
    resident per grid step, so the mean reduce, the smooth_k subtraction,
    the per-chunk amax, and the int8 cast all run on the resident slab
    (the reference fuses the same chain on the SM tile:
    quant_per_block_int8_fuse_sub_mean_cuda, csrc/fused/fused.cu:594-682).
    The chain is bit-identical to ``jnp.mean`` + ``quant_k_chunked``
    except the mean's accumulation order (ULP-level).

    Falls back to the two-pass path for slabs over ``_K_FUSED_BYTES``
    (Mosaic materializes the f32 slab ~3x during the chain) or ragged
    sequences — callers gate on :func:`k_fused_eligible`.
    """
    b, h, s, d = k.shape
    assert k_fused_eligible(s, d, group), (s, d, group)
    qmax = 7.0 if bits == 4 else 127.0
    n_chunks = s // group
    k3 = k.reshape(b * h, s, d)
    slabs = _slabs_per_step(b * h, s * d * k.dtype.itemsize)
    n_steps = (b * h) // slabs
    out_shape = [
        jax.ShapeDtypeStruct((b * h, s, d), jnp.int8),
        jax.ShapeDtypeStruct((n_steps, 1, slabs * n_chunks), jnp.float32),
        jax.ShapeDtypeStruct((b * h, 1, d), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((slabs, s, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 1, slabs * n_chunks), lambda i: (i, 0, 0)),
        pl.BlockSpec((slabs, 1, d), lambda i: (i, 0, 0)),
    ]
    if not smooth:
        out_shape = out_shape[:2]
        out_specs = out_specs[:2]

    def kernel(k_ref, o_ref, s_ref, km_ref=None):
        _quant_k_fused_kernel(
            k_ref, o_ref, s_ref, km_ref, qmax=qmax, group=group,
            n_chunks=n_chunks, smooth=smooth, slabs=slabs,
        )

    outs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((slabs, s, d), lambda i: (i, 0, 0))],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(k3)
    k_i8 = outs[0].reshape(b, h, s, d)
    # [n_steps, 1, slabs*n_chunks] row-major == slab-major chunk order
    scales = outs[1].reshape(b, h, n_chunks)
    km = outs[2].reshape(b, h, d) if smooth else None
    return k_i8, scales, km


# --------------------------------------------------------------------------
# V: per-channel scales (+ optional mean), whole sequence per grid step
# --------------------------------------------------------------------------


def _quant_v_kernel(v_ref, o_ref, s_ref, m_ref, *, qmax, smooth, out_dt,
                    slabs):
    for g in range(slabs):  # overhead amortization, see _slabs_per_step
        x = v_ref[g].astype(jnp.float32)  # [s, d]
        if smooth:
            mean = jnp.mean(x, axis=0, keepdims=True)  # [1, d]
            x = x - mean
            m_ref[g] = mean
        amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)  # [1, d]
        scale, r = _inv_scale(amax, qmax)
        scaled = x * r
        if jnp.dtype(out_dt) == jnp.int8.dtype:
            # no clip: see _quant_k_fused_kernel (amax-derived r)
            o_ref[g] = _round_half_away(scaled).astype(jnp.int8)
        else:
            o_ref[g] = scaled.astype(out_dt)
        s_ref[g] = scale


def _v_stats_kernel(
    v_ref, mx_ref, mn_ref, sm_ref, mx_scr, mn_scr, sm_scr,
    *, s, block_s, n_blocks, do_sum,
):
    """Per-channel max / min / sum accumulated across sequence blocks in
    scratch — the blocked reduction pass of the two-pass V quantizer (the
    reference's MeanScaleKernel channel reduce, fused.cu:316-427).
    max/min commute with blocking exactly; ragged tail rows are masked."""
    x = v_ref[0].astype(jnp.float32)  # [bs, d]
    j = pl.program_id(1)
    if s % block_s:
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + j * block_s
        valid = row < s
        bmax = jnp.max(jnp.where(valid, x, -jnp.inf), axis=0, keepdims=True)
        bmin = jnp.min(jnp.where(valid, x, jnp.inf), axis=0, keepdims=True)
        bsum = (
            jnp.sum(jnp.where(valid, x, 0.0), axis=0, keepdims=True)
            if do_sum else None
        )
    else:
        bmax = jnp.max(x, axis=0, keepdims=True)
        bmin = jnp.min(x, axis=0, keepdims=True)
        bsum = jnp.sum(x, axis=0, keepdims=True) if do_sum else None

    @pl.when(j == 0)
    def _init():
        mx_scr[...] = bmax
        mn_scr[...] = bmin
        if do_sum:
            sm_scr[...] = bsum

    @pl.when(j != 0)
    def _acc():
        mx_scr[...] = jnp.maximum(mx_scr[...], bmax)
        mn_scr[...] = jnp.minimum(mn_scr[...], bmin)
        if do_sum:
            sm_scr[...] = sm_scr[...] + bsum

    @pl.when(j == n_blocks - 1)
    def _emit():
        mx_ref[0] = mx_scr[...]
        mn_ref[0] = mn_scr[...]
        if do_sum:
            sm_ref[0] = sm_scr[...]


def _v_apply_kernel(v_ref, r_ref, m_ref, o_ref, *, qmax, smooth, out_dt):
    """Quantize one seq block with precomputed per-channel 1/scale (+mean).
    Pad-tail rows quantize garbage that the caller crops."""
    x = v_ref[0].astype(jnp.float32)  # [bs, d]
    if smooth:
        x = x - m_ref[0]
    scaled = x * r_ref[0]
    if jnp.dtype(out_dt) == jnp.int8.dtype:
        o_ref[0] = jnp.clip(
            _round_half_away(scaled), -127, 127
        ).astype(jnp.int8)
    else:
        # clamp so pad-row garbage cannot overflow the f8 cast (e4m3 has
        # no inf); valid rows satisfy |scaled| <= qmax by construction
        o_ref[0] = jnp.clip(scaled, -qmax, qmax).astype(out_dt)


def _quant_v_blocked(v, *, dtype, smooth, interpret):
    """Two-pass blocked V quantizer for slabs too big for VMEM: pass 1
    reduces per-channel (max, min, sum) over sequence blocks, a tiny XLA
    combine produces (mean, 1/scale), pass 2 streams the quantization.
    amax is exact (max/min commute with blocking); the mean's summation
    order differs from the one-pass spec at ULP level."""
    b, h, s, d = v.shape
    qmax = 127.0 if jnp.dtype(dtype) == jnp.int8.dtype else float(
        quant_spec._QMAX[jnp.dtype(dtype)]
    )
    bs = max(256, _V_BLOCK_BYTES // (d * v.dtype.itemsize) // 256 * 256)
    nb = -(-s // bs)
    s_pad = nb * bs
    v3 = v.reshape(b * h, s, d)
    if s_pad != s:
        v3 = jnp.pad(v3, ((0, 0), (0, s_pad - s), (0, 0)))
    bh = b * h

    gmax, gmin, gsum = pl.pallas_call(
        functools.partial(
            _v_stats_kernel, s=s, block_s=bs, n_blocks=nb, do_sum=smooth
        ),
        grid=(bh, nb),
        in_specs=[pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(v3)

    if smooth:
        mean = gsum / s
        # max_i(x_i - m) == max_i(x_i) - m under monotone fl subtraction
        amax = jnp.maximum(gmax - mean, mean - gmin)
    else:
        mean = jnp.zeros_like(gmax)
        amax = jnp.maximum(gmax, -gmin)
    scale, r = _inv_scale(amax, qmax)

    v_q = pl.pallas_call(
        functools.partial(
            _v_apply_kernel, qmax=qmax, smooth=smooth, out_dt=dtype
        ),
        grid=(bh, nb),
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(v3, r, mean)

    v_q = v_q[:, :s].reshape(b, h, s, d)
    v_scale = scale[:, 0].reshape(b, h, d)
    v_mean = mean[:, 0].reshape(b, h, d) if smooth else None
    return v_q, v_scale, v_mean


@functools.partial(
    jax.jit, static_argnames=("dtype", "smooth", "interpret")
)
def quant_v_per_channel(
    v: jax.Array,
    *,
    dtype=jnp.int8,
    smooth: bool = False,
    interpret: bool = False,
):
    """[b,h,s,d] -> (v_q, v_scale [b,h,d] f32, v_mean [b,h,d] or None) —
    the per-channel (column) quantization of V with optional smooth_v.
    Slabs that fit VMEM run the single-pass whole-sequence kernel; larger
    sequences run the blocked two-pass kernels (no XLA fallback at any
    size)."""
    b, h, s, d = v.shape
    if s * d * v.dtype.itemsize > _V_VMEM_BYTES:
        return _quant_v_blocked(
            v, dtype=dtype, smooth=smooth, interpret=interpret
        )
    qmax = 127.0 if jnp.dtype(dtype) == jnp.int8.dtype else float(
        quant_spec._QMAX[jnp.dtype(dtype)]
    )
    v3 = v.reshape(b * h, s, d)
    slabs = _slabs_per_step(b * h, s * d * v.dtype.itemsize,
                            budget=_V_VMEM_BYTES)
    outs = pl.pallas_call(
        functools.partial(
            _quant_v_kernel, qmax=qmax, smooth=smooth, out_dt=dtype,
            slabs=slabs,
        ),
        grid=((b * h) // slabs,),
        in_specs=[pl.BlockSpec((slabs, s, d), lambda i: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((slabs, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((slabs, 1, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((slabs, 1, d), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s, d), dtype),
            jax.ShapeDtypeStruct((b * h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(v3)
    v_q = outs[0].reshape(b, h, s, d)
    v_scale = outs[1].reshape(b, h, d)
    v_mean = outs[2].reshape(b, h, d) if smooth else None
    return v_q, v_scale, v_mean
