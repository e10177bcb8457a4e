"""Quick on-chip probe of the fused training path (bench sec_train shape).

Usage: python tools/probe_train.py [--hd 128] [--seq 4096]
"""
import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--no-flash", action="store_true")
    args = ap.parse_args()

    from sageattention_tpu.ops import attention_bwd_pallas
    from bench.utils import device_time_carry

    tb, th, ts, td = args.batch, args.heads, args.seq, args.hd
    qt = jax.random.normal(jax.random.PRNGKey(8), (tb, th, ts, td))
    kt = jax.random.normal(jax.random.PRNGKey(9), (tb, th, ts, td))
    vt = jax.random.normal(jax.random.PRNGKey(10), (tb, th, ts, td))
    dot = jax.random.normal(jax.random.PRNGKey(11), (tb, th, ts, td))

    def train_one(q, k, v, do):
        dq, dk, dv = attention_bwd_pallas.quantized_attention_vjp(
            q, k, v, do, is_causal=True, sm_scale=None)
        # element 0 must depend on ALL grads — the harness uses only
        # r.ravel()[0] and XLA DCEs unused pallas_calls
        return dq[:1, 0, 0, 0] + dk[:1, 0, 0, 0] + dv[:1, 0, 0, 0]

    t_train = device_time_carry(train_one, qt, (kt, vt, dot), n=5)
    print(f"sage fwd+bwd s{ts} hd{td}: {t_train*1e3:.2f} ms")

    if not args.no_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention,
        )

        def fit(s, cands):
            for c in cands:
                if s % c == 0:
                    return c
            return 128

        bq = fit(ts, (512, 256, 128))
        bk = fit(ts, (1024, 512, 256, 128))
        bkm = fit(ts, (2048, 1024, 512, 256, 128))
        bs = BlockSizes(
            block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bkm,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
        )

        def flash_train(q, k, v, do):
            f = lambda q, k, v: flash_attention(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16), causal=True, block_sizes=bs)
            _, vjp = jax.vjp(f, q, k, v)
            dq, dk, dv = vjp(do.astype(jnp.bfloat16))
            return dq[:1, 0, 0, 0] + dk[:1, 0, 0, 0] + dv[:1, 0, 0, 0]

        t_f = device_time_carry(flash_train, qt, (kt, vt, dot), n=5)
        print(f"flash fwd+bwd: {t_f*1e3:.2f} ms, ratio {t_f/t_train:.3f}")


if __name__ == "__main__":
    main()
