#!/usr/bin/env python
"""Headline benchmark (driver-run).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: fused sage-attention kernel throughput (attention-kernel-only TOPS,
quantization excluded — the reference's protocol, reference:
bench/README.md:63, flops = 4*h*b*hd*s^2 / time, bench_qk_int8_pv_fp8_cuda
.py:71) at the reference's sweep shape b=4, h=32, hd=128, s=4096.

Baseline: the best-tuned jax.experimental Pallas flash-attention (bf16) on
the same chip and shape — the TPU equivalent of the reference's FA2
baseline (reference: bench/bench_baseline.py).

Detailed per-config numbers go to stderr.
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def device_time(fn_one, args, n=10, reps=3):
    """Two-point-slope scan-chain timing (see bench/utils.py for the full
    rationale: fixed ~30 ms tunnel cost per jit call, carry must feed the
    iteration inputs or XLA hoists the launch)."""
    from bench.utils import device_time as _dt

    return _dt(fn_one, args, n=n, reps=reps)


def main():
    from sageattention_tpu import quant
    from sageattention_tpu.ops.attention_pallas import sage_attention_fused

    b, h, s, d = 4, 32, 4096, 128
    bq, bk = 512, 4096
    flops = 4 * b * h * d * s * s

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), dtype=jnp.bfloat16)

    from sageattention_tpu.ops.attention_pallas import effective_chunk_k

    q_i8, qs = quant.quant_int8(
        q, granularity="per_token", scale_fold=d**-0.5 * 1.4426950408889634
    )
    k_i8, ksb = quant.quant_int8_block_scales(k, group=effective_chunk_k(bk))
    v_q, vs, _ = quant.per_channel_quant(v, dtype=jnp.int8)

    fo = functools.partial(
        sage_attention_fused, pv_dtype="int8", block_q=bq, block_k=bk
    )

    def one(i, c, qi, qss, ki, kss, vq, vsc):
        # perturb the small scale tensor (not the 64MB q) to keep the scan
        # iterations dependent without measurable overhead
        return fo(qi, qss + c * 1e-30, ki, kss, vq, vsc)

    t_sage = device_time(one, (q_i8, qs, k_i8, ksb, v_q, vs), n=10)
    tops_sage = flops / t_sage / 1e12
    log(f"sage int8-QK/int8-PV kernel: {t_sage*1e3:.3f} ms = {tops_sage:.1f} TOPS")

    # baseline: tuned jax flash attention (bf16)
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        bs = BlockSizes(
            block_q=512, block_k_major=2048, block_k=1024, block_b=1,
            block_q_major_dkv=512, block_k_major_dkv=2048,
            block_k_dkv=1024, block_q_dkv=512,
            block_k_major_dq=2048, block_k_dq=1024, block_q_dq=512,
        )
        fb = functools.partial(flash_attention, block_sizes=bs)

        def one_base(i, c, q, k, v):
            return fb(q + c.astype(q.dtype) * 1e-12, k, v)

        t_base = device_time(one_base, (q, k, v), n=10)
        tops_base = flops / t_base / 1e12
        log(f"jax flash-attention bf16 baseline: {t_base*1e3:.3f} ms = {tops_base:.1f} TFLOPS")
        vs_baseline = t_base / t_sage
    except Exception as e:  # baseline unavailable — report absolute only
        log(f"baseline failed: {e}")
        vs_baseline = float("nan")

    print(
        json.dumps(
            {
                "metric": "sage_attention_kernel_TOPS_b4h32s4096hd128",
                "value": round(tops_sage, 2),
                "unit": "TOPS",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
