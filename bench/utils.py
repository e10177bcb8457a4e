"""Benchmark timing utilities (reference: bench/utils.py:7-33).

The reference flushes L2 and times with CUDA events; here the tunneled TPU
backend has ~35 ms per-call dispatch overhead and no reliable
block_until_ready, so timing uses a jitted scan chain: one jit call runs
``n`` dependent kernel launches on-device and the wall clock is divided by
``n``.  The chain must thread the carry into each iteration's *inputs*
(through a small tensor) or XLA hoists the launch out of the loop.
min-of-reps guards against the shared chip's load variance.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def device_time(fn_one, args, n: int = 10, reps: int = 5) -> float:
    """Two-point slope per-iteration device time.

    Each jit call through the tunnel carries a FIXED ~30 ms round-trip cost
    independent of the scan length (measured: a null scan body costs the
    same at n=10 and n=40), so a single-point measurement overstates small
    kernels by ~3 ms/iter.  Timing the same chain at n and 3n and taking
    the slope cancels the fixed cost exactly.

    ``fn_one(i, carry, *args)`` must return an array and must consume
    ``carry`` (or ``i``) through one of its *inputs* so iterations cannot
    be hoisted.
    """

    def make(steps):
        @jax.jit
        def many(*a):
            def body(c, i):
                r = fn_one(i, c, *a)
                return c + r.ravel()[0].astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
            return c

        return many

    lo, hi = make(n), make(3 * n)
    _ = np.asarray(lo(*args))  # warm + sync (compiles both)
    _ = np.asarray(hi(*args))
    slopes = []
    for _ in range(reps):
        t0 = time.time()
        _ = np.asarray(lo(*args))
        t1 = time.time()
        _ = np.asarray(hi(*args))
        t2 = time.time()
        slopes.append(((t2 - t1) - (t1 - t0)) / (2 * n))
    # median of slope estimates: robust against the shared chip's clock
    # drift between the lo and hi runs (a min would keep drift artifacts)
    slopes.sort()
    return slopes[len(slopes) // 2]


def device_time_carry(fn, big, extra=(), n: int = 10,
                      reps: int = 5) -> float:
    """Two-point-slope timing with an in-place carry perturbation.

    ``device_time``'s ``x + c*0`` perturbation MATERIALIZES a fresh copy
    of ``x`` per iteration when x feeds a pallas_call / big fusion —
    measured ~850 us per 64 MB operand on v5e (r4), silently inflating
    every big-input measurement.  Here the big operand rides the scan
    CARRY and is perturbed by a scalar ``.at[0,...,0].set()`` — XLA
    aliases scan carries, so the update is in-place and costs ~nothing.
    ``fn(big, *extra)`` must return an array; extra operands pass through
    as explicit jit args (closures would embed them as HLO constants —
    the tunnel's compile endpoint rejects >100 MB request bodies)."""

    def make(steps):
        @jax.jit
        def many(big, *extra):
            def body(carry, i):
                bigc, acc = carry
                bigc = bigc.at[(0,) * bigc.ndim].set(
                    (acc * 1e-30).astype(bigc.dtype))
                r = fn(bigc, *extra)
                return (
                    bigc,
                    acc + r.ravel()[0].astype(jnp.float32),
                ), None

            (_, acc), _ = jax.lax.scan(
                body, (big, jnp.float32(0)), jnp.arange(steps)
            )
            return acc

        return many

    lo, hi = make(n), make(3 * n)
    _ = np.asarray(lo(big, *extra))
    _ = np.asarray(hi(big, *extra))
    slopes = []
    for _ in range(reps):
        t0 = time.time()
        _ = np.asarray(lo(big, *extra))
        t1 = time.time()
        _ = np.asarray(hi(big, *extra))
        t2 = time.time()
        slopes.append(((t2 - t1) - (t1 - t0)) / (2 * n))
    slopes.sort()
    return slopes[len(slopes) // 2]


def attention_flops(b: int, h: int, s: int, d: int, causal: bool) -> int:
    """The reference's TOPS metric: 4*h*b*hd*s^2 / (2 if causal)
    (reference: bench/bench_qk_int8_pv_fp8_cuda.py:71)."""
    return 4 * b * h * d * s * s // (2 if causal else 1)
