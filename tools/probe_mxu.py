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


def _probe_kernel(x_ref, y_ref, o_ref, *, body, reps: int):
    x = x_ref[...]
    acc = body(x, y_ref[...])
    for _ in range(reps - 1):
        # dependency chain: a scalar of the previous result perturbs the
        # next lhs (value-neutral for int: +0 or +1 on int8 operands of a
        # dot we only time; for float: + tiny)
        # rows of acc and x both equal M, so acc[:, 0:1] broadcasts
        # along lanes only (Mosaic can't broadcast sublanes AND lanes)
        if x.dtype == jnp.int8:
            # Mosaic has no vector<i8> add; perturb in i32 and cast back
            x = (
                x_ref[...].astype(jnp.int32) + (acc[:, 0:1] & 1)
            ).astype(jnp.int8)
        else:
            x = x_ref[...] + acc[:, 0:1].astype(x_ref.dtype) * 1e-30
        acc = body(x, y_ref[...])
    o_ref[...] = acc[0:8, 0:1].astype(jnp.float32) * jnp.ones(
        (8, 128), jnp.float32
    )


def probe(name, x, y, body, flops_per_rep, reps=64):
    f = pl.pallas_call(
        functools.partial(_probe_kernel, body=body, reps=reps),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
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

    t = device_time(one, (x, y), n=10, reps=5)
    per_rep = t / reps
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

    print("== VPU: per-element passes on a [128, 2048] f32 tile ==")
    xf, yf = mk((M, N), jnp.float32), mk((M, N), jnp.float32)
    el = M * N
    probe("exp2(x)", xf, yf, lambda a, b: jnp.exp2(a), el)
    probe("exp2(x*r - m) fused", xf, yf,
          lambda a, b: jnp.exp2(a * 1.1 - 3.0), el)
    probe("max over lanes -> bcast", xf, yf,
          lambda a, b: jnp.broadcast_to(
              jnp.max(a, axis=1)[:, None], a.shape) + a * 1e-30, el)
    probe("sum over lanes -> bcast", xf, yf,
          lambda a, b: jnp.broadcast_to(
              jnp.sum(a, axis=1)[:, None], a.shape) + a * 1e-30, el)
    probe("astype bf16 (and back)", xf, yf,
          lambda a, b: a.astype(jnp.bfloat16).astype(jnp.float32), el)
    probe("f32 -> int8 quantize (x*127+.5)", xf, yf,
          lambda a, b: (a * 127.0 + 0.5).astype(jnp.int8).astype(
              jnp.float32), el)
    xi = mk((M, N), jnp.int8).astype(jnp.int32)
    probe("i32 -> f32 cast", xi, yf,
          lambda a, b: a.astype(jnp.float32), el)
    probe("i32 max over lanes -> bcast", xi, yf,
          lambda a, b: (jnp.broadcast_to(
              jnp.max(a, axis=1)[:, None], a.shape) + a).astype(
                  jnp.float32), el)


if __name__ == "__main__":
    main()
