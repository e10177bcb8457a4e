"""Round-5 on-chip measurement pass (one process, one backend init).

Covers, in order of value:
  1. fwd+bwd hd128 + hd64 causal 4k (the r4 training regression fix)
  2. hd64 + hd128 op-total with vt_native ON vs OFF (relayout removal)
  3. window s16384 W4096 with the vt config (the r4 misreport fix)
  4. paged decode vs dense (the pair-walk fix)
  5. in-kernel additive-bias timing sanity (vs bool mask)

Usage: python tools/probe_r5.py [--skip 1,2,...]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()
    skip = set(int(x) for x in args.skip.split(",") if x)

    from bench.utils import attention_flops, device_time_carry
    from sageattention_tpu.ops import attention_bwd_pallas

    log(f"devices: {jax.devices()}")

    # ---- 1. training fwd+bwd ----
    if 1 not in skip:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention,
        )

        def fit(s, cands):
            for c in cands:
                if s % c == 0:
                    return c
            return 128

        for td in (128, 64):
            tb, th, ts = 4, 16, 4096
            qt = jax.random.normal(jax.random.PRNGKey(8), (tb, th, ts, td))
            kt = jax.random.normal(jax.random.PRNGKey(9), (tb, th, ts, td))
            vt = jax.random.normal(jax.random.PRNGKey(10), (tb, th, ts, td))
            dot = jax.random.normal(jax.random.PRNGKey(11), (tb, th, ts, td))

            def train_one(q, k, v, do):
                dq, dk, dv = attention_bwd_pallas.quantized_attention_vjp(
                    q, k, v, do, is_causal=True, sm_scale=None)
                # element 0 must depend on ALL grads — the harness uses
                # only r.ravel()[0] and XLA DCEs unused pallas_calls
                return (dq[:1, 0, 0, 0] + dk[:1, 0, 0, 0]
                        + dv[:1, 0, 0, 0])

            t_tr = device_time_carry(train_one, qt, (kt, vt, dot), n=args.n)
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
                return (dq[:1, 0, 0, 0] + dk[:1, 0, 0, 0]
                        + dv[:1, 0, 0, 0])

            t_fl = device_time_carry(flash_train, qt, (kt, vt, dot),
                                     n=args.n)
            log(f"[1] fwd+bwd s4096 hd{td} causal: sage {t_tr*1e3:.2f} ms, "
                f"flash {t_fl*1e3:.2f} ms, ratio {t_fl/t_tr:.3f}")

    # ---- 2. op-total vt_native A/B ----
    if 2 not in skip:
        from sageattention_tpu import core as sa_core
        from sageattention_tpu import sageattn

        for d in (64, 128):
            s = 4096
            q = jax.random.normal(jax.random.PRNGKey(0), (4, 32, s, d),
                                  jnp.bfloat16)
            k = jax.random.normal(jax.random.PRNGKey(1), (4, 32, s, d),
                                  jnp.bfloat16)
            v = jax.random.normal(jax.random.PRNGKey(2), (4, 32, s, d),
                                  jnp.bfloat16)
            for native in (True, False):
                sa_core._VT_NATIVE = native
                # distinct impl kwarg avoids jit-cache aliasing between
                # the two modes (vt_native is a static of the inner fn)
                t_op = device_time_carry(sageattn, q, (k, v), n=args.n)
                tops = attention_flops(4, 32, s, d, False) / t_op / 1e12
                log(f"[2] op-total s{s} hd{d} vt_native={native}: "
                    f"{t_op*1e3:.3f} ms = {tops:.1f} TOPS")
            sa_core._VT_NATIVE = True

    # ---- 3. window metric with vt config ----
    if 3 not in skip:
        from bench.bench_kernel import bench_one
        from sageattention_tpu.ops.attention_pallas import default_config

        s, d, W = 16384, 128, 4096
        bq, bk, sub, ck = default_config(s, s, d, True, vt=True, window=W)
        _, t_win = bench_one(
            4, 32, s, d, causal=True, pv_dtype="int8", quant_gran="auto",
            block_q=bq, block_k=bk, chunk_k=ck, sub_q=sub, window=W,
        )
        band = W * (W + 1) // 2 + (s - W) * W
        log(f"[3] window s{s} W{W} cfg={bq}/{bk}/{sub}/{ck}: "
            f"{t_win*1e3:.3f} ms = {4*4*32*d*band/t_win/1e12:.1f} band-TOPS")

    # ---- 4. paged decode vs dense ----
    if 4 not in skip:
        from sageattention_tpu import kvcache

        db, dhkv, dgroup, dd, dS = 4, 8, 4, 128, 32768
        dhq = dhkv * dgroup
        kc = jax.random.normal(jax.random.PRNGKey(5), (db, dhkv, dS, dd),
                               jnp.bfloat16)
        vc = jax.random.normal(jax.random.PRNGKey(6), (db, dhkv, dS, dd),
                               jnp.bfloat16)
        cache = kvcache.init_kv_cache(db, dhkv, dS, dd)
        cache, lens = kvcache.append_kv(
            cache, jnp.zeros((db,), jnp.int32), kc, vc)
        qd = jax.random.normal(jax.random.PRNGKey(7), (db, dhq, 1, dd),
                               jnp.bfloat16)
        from bench.utils import device_time as _dt

        t_dec = _dt(
            lambda i, c, q, cache: kvcache.sageattn_decode(
                q + (c * 1e-30).astype(q.dtype), cache, lens),
            (qd, cache), n=10)
        page = 4096
        npage = db * (dS // page)
        rng = np.random.RandomState(0)
        table = jnp.asarray(
            rng.permutation(npage).reshape(db, dS // page), jnp.int32)
        pc = kvcache.init_paged_kv_cache(npage, dhkv, dd, table,
                                         page_size=page)
        pc, _ = kvcache.paged_prefill(pc, kc, vc)
        t_pg = _dt(
            lambda i, c, q, cache: kvcache.sageattn_paged_decode(
                q + (c * 1e-30).astype(q.dtype), cache, lens),
            (qd, pc), n=10)
        log(f"[4] decode 32k: dense {t_dec*1e6:.0f} us, paged(scrambled, "
            f"page={page}) {t_pg*1e6:.0f} us = {t_dec/t_pg:.3f}x dense "
            f"({2*db*dhkv*dS*dd/t_pg/1e9:.0f} GB/s)")

    # ---- 5. in-kernel bias timing sanity ----
    if 5 not in skip:
        from sageattention_tpu import sageattn

        s, d = 4096, 128
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 8, s, d),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 8, s, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 8, s, d),
                              jnp.bfloat16)
        bias = (jax.random.normal(jax.random.PRNGKey(3), (1, 1, s, s))
                .astype(jnp.bfloat16))
        t_b = device_time_carry(
            lambda q, k, v, b: sageattn(q, k, v, attn_bias=b),
            q, (k, v, bias), n=args.n)
        mask = jnp.ones((1, 1, s, s), bool)
        t_m = device_time_carry(
            lambda q, k, v, m: sageattn(q, k, v, attn_mask=m),
            q, (k, v, mask), n=args.n)
        t_0 = device_time_carry(
            lambda q, k, v: sageattn(q, k, v), q, (k, v), n=args.n)
        log(f"[5] s{s} hd{d} b1h8: plain {t_0*1e3:.3f} ms, bool-mask "
            f"{t_m*1e3:.3f} ms, additive-bias {t_b*1e3:.3f} ms")

    log("probe_r5 done")


if __name__ == "__main__":
    main()
