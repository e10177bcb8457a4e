#!/usr/bin/env python
"""MXU/VPU primitive probes for kernel-design decisions (round 3).

Measures the per-op device time of the exact dot shapes the fused kernel
issues, to answer:
  1. Does an int8 QK^T with contraction d=64 run at HALF the d=128 rate
     (lane padding) or at the same FLOPs rate?
  2. Does a bf16 PV with output width 64 cost half of width 128?
  3. What does the f32->int8 quantize of a P tile cost relative to the
     PV matmul it would accelerate (pv_compute='int8')?
  4. VPU cost of the softmax chain per element (max, exp2, cast).

Each probe runs ``reps`` dependent copies of the op inside ONE Pallas
kernel; a tiny scalar from the previous result perturbs the next input
so Mosaic cannot CSE or reorder the chain.  Per-kernel overheads are
cancelled by the two-point slope in bench.utils.device_time.

Run on the real chip: python tools/probe_mxu.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench.utils import device_time


def _probe_kernel(x_ref, y_ref, o_ref, acc_scr, *, body, reps: int,
                  skip_body: bool):
    # fori_loop chain that CONSUMES the full result each iteration: the
    # accumulator += makes every output element live, so Mosaic cannot
    # narrow the dot to the lanes a scalar summary would touch (the
    # failure mode of summary-consuming probes: d=256 "measured" 2067
    # TOPS, 6x the physical roofline).  The += pass is measured
    # separately (skip_body) and subtracted by the caller.
    def step(_, carry):
        # perturb through a row-shaped slice of the accumulator (rows of
        # acc_scr == rows of x): lanes-only broadcast — Mosaic cannot
        # broadcast in sublanes AND lanes at once
        s = acc_scr[0:x_ref.shape[0], 0:1]
        if x_ref.dtype == jnp.int8:
            # Mosaic has no vector<i8> add; perturb in i32, cast back
            x = (
                x_ref[...].astype(jnp.int32)
                + (s.astype(jnp.int32) & 1)
            ).astype(jnp.int8)
        else:
            x = x_ref[...] + s.astype(x_ref.dtype) * 1e-30
        if skip_body:
            # baseline: same perturb + same consuming add, no body op
            acc_scr[...] += x[:, 0:1].astype(acc_scr.dtype)
        else:
            acc_scr[...] += body(x, y_ref[...]).astype(acc_scr.dtype)
        return carry + acc_scr[0:8, 0:1].astype(jnp.float32)

    o_ref[...] = jax.lax.fori_loop(
        0, reps, step, jnp.zeros((8, 128), jnp.float32)
    )


def _time_variant(x, y, body, out_shape, reps, skip_body,
                  acc_dtype=jnp.float32):
    f = pl.pallas_call(
        functools.partial(
            _probe_kernel, body=body, reps=reps, skip_body=skip_body
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM(out_shape, acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )

    def one(i, c, xx, yy):
        if xx.dtype == jnp.int8:
            xx = xx + (i % 2).astype(jnp.int8)
        else:
            xx = xx + c.astype(xx.dtype) * 1e-30
        return f(xx, yy)

    return device_time(one, (x, y), n=10, reps=5)


def probe(name, x, y, body, flops_per_rep, reps=512, pure_vpu=False):
    out = jax.eval_shape(body, x, y)
    if pure_vpu:
        # elementwise/VPU probes: the consuming += IS part of the
        # measured chain; report the raw per-rep time
        t = _time_variant(x, y, body, out.shape, reps, skip_body=False)
        per_rep = t / reps
    else:
        # dot probes: accumulate in the dot's own output dtype (no
        # cast pass inside the measured chain) and run a long chain so
        # the full-minus-baseline subtraction resolves ~0.1 us ops
        reps = max(reps, 4096)
        t_full = _time_variant(x, y, body, out.shape, reps,
                               skip_body=False, acc_dtype=out.dtype)
        t_base = _time_variant(x, y, body, out.shape, reps,
                               skip_body=True, acc_dtype=out.dtype)
        per_rep = max((t_full - t_base) / reps, 1e-9)
    unit = flops_per_rep / per_rep / 1e12
    print(f"{name:44s} {per_rep*1e6:9.3f} us/rep  {unit:8.1f} "
          "T(fl)OPS", flush=True)
    return per_rep


def main():
    key = jax.random.PRNGKey(0)
    M, N = 128, 2048

    def mk(shape, dtype):
        if dtype == jnp.int8:
            return jax.random.randint(key, shape, -7, 7, jnp.int8)
        return jax.random.normal(key, shape, dtype)

    def dot_nt(a, b):  # contract last dims (QK^T shape)
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32
            if a.dtype == jnp.int8 else jnp.float32,
        )

    def dot_nn(a, b):  # P @ V shape
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32
            if a.dtype == jnp.int8 else jnp.float32,
        )

    # KNOWN LIMITATION (r4 measured): the int8 QK^T probes at d=64/128
    # report impossible rates (33k+ TOPS) — Mosaic folds the dependent
    # chain despite the full-consume accumulator, so ONLY the d=256 row
    # and the bf16/int8 PV + VPU sections below are trustworthy.  The
    # honest int8 matmul rate comes from bench.py's max-consumed
    # 8192^3 roofline (343 TOPS on v5e).
    print("== QK^T int8: [M,d] x [N,d], contraction width d ==")
    for d in (64, 128, 256):
        x, y = mk((M, d), jnp.int8), mk((N, d), jnp.int8)
        probe(f"int8 qk d={d}", x, y, dot_nt, 2 * M * N * d)

    print("== QK^T int8 d=64: M sweep ==")
    for m in (256, 512):
        x, y = mk((m, 64), jnp.int8), mk((N, 64), jnp.int8)
        probe(f"int8 qk d=64 M={m}", x, y, dot_nt, 2 * m * N * 64)

    print("== PV bf16: [M,S] x [S,dv], output width dv ==")
    S = 2048
    for dv in (64, 128, 256):
        x, y = mk((M, S), jnp.bfloat16), mk((S, dv), jnp.bfloat16)
        probe(f"bf16 pv dv={dv}", x, y, dot_nn, 2 * M * S * dv)

    print("== PV int8 (pv_compute='int8' target rate) ==")
    for dv in (64, 128):
        x, y = mk((M, S), jnp.int8), mk((S, dv), jnp.int8)
        probe(f"int8 pv dv={dv}", x, y, dot_nn, 2 * M * S * dv)

    print("== transposed formulation (d=64 rescue): S^T = K.Q^T, "
          "O^T = V^T.P^T ==")
    # score^T: A = K [chunk, 64] streams M; stationary B = Q^T [64, 128]:
    # contraction 64 (half-filled) x N = 128 (full) — same rate as the
    # normal orientation's QK if only the contraction depth matters.
    x, y = mk((S, 64), jnp.int8), mk((64, M), jnp.int8)
    probe("int8 qk^T [2048,64]x[64,128]", x, y, dot_nn, 2 * S * 64 * M)
    # PV^T: A = V^T [64, chunk] streams M=64; stationary B = P^T
    # [chunk, 128]: contraction AND lanes both full — the full-rate PV
    # the normal orientation cannot reach at d=64.
    x, y = mk((64, S), jnp.bfloat16), mk((S, M), jnp.bfloat16)
    probe("bf16 pv^T [64,2048]x[2048,128]", x, y, dot_nn, 2 * 64 * S * M)
    # +8 sublane rows (a ones row would carry sum(p) for free): is the
    # marginal M cost the expected ~12%?
    x, y = mk((72, S), jnp.bfloat16), mk((S, M), jnp.bfloat16)
    probe("bf16 pv^T M=72 (rowsum row)", x, y, dot_nn, 2 * 72 * S * M)

    print("== vt_native: same products with NORMAL-layout operands, "
          "transpose inside dot_general dimension_numbers ==")
    # S^T = K.Q^T with Q in its normal [sub, d] tile: contract d-vs-d
    # (dims (1,1)) — if Mosaic feeds this at the same rate as the
    # pre-transposed [64, 128] stationary operand, the XLA Q^T relayout
    # pass is free to delete (core.py vt_native).
    x, y = mk((S, 64), jnp.int8), mk((M, 64), jnp.int8)
    probe("int8 qk^T native [2048,64]x[128,64]@(1,1)", x, y, dot_nt,
          2 * S * 64 * M)
    # O^T = V^T.P^T with V in its normal [chunk, d_v] tile: contract
    # chunk-vs-chunk (dims (0,0)) -> [d_v, sub]
    x, y = mk((S, 64), jnp.bfloat16), mk((S, M), jnp.bfloat16)
    probe("bf16 pv^T native [2048,64]x[2048,128]@(0,0)", x, y,
          lambda a, b: jax.lax.dot_general(
              a, b, (((0,), (0,)), ((), ())),
              preferred_element_type=jnp.float32),
          2 * 64 * S * M)
    # epilogue transpose cost (vt_o_normal): [64, block] f32 -> bf16^T
    xo, yo = mk((64, 512), jnp.float32), mk((64, 512), jnp.float32)
    probe("swapaxes [64,512] f32->bf16 (vt_o epilogue)", xo, yo,
          lambda a, b: jnp.swapaxes(a, 0, 1).astype(jnp.bfloat16),
          64 * 512, pure_vpu=True)
    print("== VPU: passes on a TALL [2048, 128] f32 tile (vt "
          "orientation: reductions over SUBLANES) ==")
    xt, yt = mk((S, M), jnp.float32), mk((S, M), jnp.float32)
    elt = S * M
    probe("exp2(x*r - m) fused (tall)", xt, yt,
          lambda a, b: jnp.exp2(a * 1.1 - 3.0), elt, pure_vpu=True)
    probe("max over sublanes -> bcast (tall)", xt, yt,
          lambda a, b: jnp.broadcast_to(
              jnp.max(a, axis=0)[None, :], a.shape) + a * 1e-30,
          elt, pure_vpu=True)
    probe("sum over sublanes -> bcast (tall)", xt, yt,
          lambda a, b: jnp.broadcast_to(
              jnp.sum(a, axis=0)[None, :], a.shape) + a * 1e-30,
          elt, pure_vpu=True)

    print("== VPU: per-element passes on a [128, 2048] f32 tile ==")
    xf, yf = mk((M, N), jnp.float32), mk((M, N), jnp.float32)
    el = M * N
    probe("exp2(x)", xf, yf, lambda a, b: jnp.exp2(a), el, pure_vpu=True)
    probe("exp2(x*r - m) fused", xf, yf,
          lambda a, b: jnp.exp2(a * 1.1 - 3.0), el, pure_vpu=True)
    probe("max over lanes -> bcast", xf, yf,
          lambda a, b: jnp.broadcast_to(
              jnp.max(a, axis=1)[:, None], a.shape) + a * 1e-30, el, pure_vpu=True)
    probe("sum over lanes -> bcast", xf, yf,
          lambda a, b: jnp.broadcast_to(
              jnp.sum(a, axis=1)[:, None], a.shape) + a * 1e-30, el, pure_vpu=True)
    probe("astype bf16 (and back)", xf, yf,
          lambda a, b: a.astype(jnp.bfloat16).astype(jnp.float32), el, pure_vpu=True)
    probe("f32 -> int8 quantize (x*127+.5)", xf, yf,
          lambda a, b: (a * 127.0 + 0.5).astype(jnp.int8).astype(
              jnp.float32), el, pure_vpu=True)
    xi = mk((M, N), jnp.int8).astype(jnp.int32)
    probe("i32 -> f32 cast", xi, yf,
          lambda a, b: a.astype(jnp.float32), el, pure_vpu=True)
    probe("i32 max over lanes -> bcast", xi, yf,
          lambda a, b: (jnp.broadcast_to(
              jnp.max(a, axis=1)[:, None], a.shape) + a).astype(
                  jnp.float32), el, pure_vpu=True)


if __name__ == "__main__":
    main()
