"""On-chip tile-config sweep for the fused backward at the tracked
training shape (b4 h16 s4096 causal).

Times the two pieces of `quantized_attention_vjp` separately:
  - the in-vjp forward recompute (vt kernel, forward configs)
  - `sage_attention_bwd` across (block_q, block_k, chunk_k)
so the winner can be baked into the vjp's `_fit_block` preferences.

Usage: python tools/sweep_bwd.py [--hd 128] [--seq 4096]
"""
import argparse
import itertools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--vt-out", default=None,
                    help="force vt_out 0/1 via SAGE_BWD_VT")
    args = ap.parse_args()
    if args.vt_out is not None:
        import os
        os.environ["SAGE_BWD_VT"] = args.vt_out

    from bench.utils import device_time_carry
    from sageattention_tpu import quant as quant_mod
    from sageattention_tpu.ops import (
        attention_bwd_pallas, attention_pallas, quant_pallas,
    )

    b, h, s, d = args.batch, args.heads, args.seq, args.hd
    LOG2E = attention_bwd_pallas.LOG2E
    sm_scale = d**-0.5
    key = jax.random.PRNGKey(0)
    q, k, v, do = (
        jax.random.normal(jax.random.PRNGKey(i), (b, h, s, d))
        for i in range(4)
    )

    use_vt = attention_pallas.vt_eligible_head_dim(d)
    fbq, fbk, fsub, scale_group = attention_pallas.default_config(
        s, s, d, True, vt=use_vt
    )
    log(f"forward cfg (vt={use_vt}): bq={fbq} bk={fbk} sub={fsub} "
        f"group={scale_group}")

    @jax.jit
    def prep(q, k, v):
        km = jnp.mean(k.astype(jnp.float32), axis=-2)
        q_i8, q_scale = quant_pallas.quant_q_per_token(
            q, scale_fold=sm_scale * LOG2E)
        k_i8, k_scale = quant_pallas.quant_k_chunked(
            k, km, group=scale_group)
        k_sm = (k.astype(jnp.float32) - km[..., None, :]).astype(
            jnp.bfloat16)
        return q_i8, q_scale, k_i8, k_scale, k_sm, km

    q_i8, q_scale, k_i8, k_scale, k_sm, km = jax.block_until_ready(
        prep(q, k, v))
    v_bf = v.astype(jnp.bfloat16)

    # forward recompute piece (as the vjp runs it)
    def fwd_rec(q_i8, q_scale, k_i8, k_scale, v_bf):
        if use_vt:
            return attention_pallas.sage_attention_fused(
                jnp.swapaxes(q_i8, 2, 3), q_scale, k_i8, k_scale,
                jnp.swapaxes(v_bf, 2, 3),
                vt=True, is_causal=True, pv_dtype="bf16",
                return_lse=True, block_q=fbq, block_k=fbk, sub_q=fsub,
                chunk_k=scale_group,
            )
        return attention_pallas.sage_attention_fused(
            q_i8, q_scale, k_i8, k_scale, v_bf,
            is_causal=True, pv_dtype="bf16", return_lse=True,
            block_q=fbq, block_k=fbk, sub_q=fsub, chunk_k=scale_group,
        )

    t_fwd = device_time_carry(
        lambda *a: fwd_rec(*a)[0],
        q_i8, (q_scale, k_i8, k_scale, v_bf), n=args.n)
    log(f"fwd recompute: {t_fwd*1e3:.3f} ms")
    o, lse2 = jax.block_until_ready(jax.jit(fwd_rec)(
        q_i8, q_scale, k_i8, k_scale, v_bf))

    qbf = q.astype(jnp.bfloat16)
    dobf = do.astype(jnp.bfloat16)

    results = []
    for bq, bk in itertools.product((512, 256, 1024), (4096, 2048, 1024)):
        if bq > s or bk > s:
            continue
        for ck in (2048, 1024, 512, 256):
            if ck > bk or bk % ck:
                continue
            if ck % scale_group and scale_group % ck:
                continue

            def bwd_one(do_, q_i8, q_scale, k_i8, k_scale, k_sm, qbf,
                        v_bf, o, lse2, bq=bq, bk=bk, ck=ck):
                dq, dk, dv = attention_bwd_pallas.sage_attention_bwd(
                    q_i8, q_scale, k_i8, k_scale, k_sm, qbf, v_bf,
                    o, lse2, do_,
                    is_causal=True, sm_scale=sm_scale,
                    block_q=bq, block_k=bk, chunk_k=ck,
                    scale_group=scale_group,
                )
                # element 0 must depend on ALL THREE kernels or the
                # timing harness (which consumes only r.ravel()[0])
                # lets XLA dead-code-eliminate the dkv pallas_call
                return (dq[:1, 0, 0, 0] + dk[:1, 0, 0, 0]
                        + dv[:1, 0, 0, 0])

            try:
                t = device_time_carry(
                    bwd_one, dobf,
                    (q_i8, q_scale, k_i8, k_scale, k_sm, qbf, v_bf, o,
                     lse2),
                    n=args.n)
            except Exception as e:
                log(f"bq={bq} bk={bk} ck={ck}: FAIL "
                    f"{type(e).__name__}: {str(e)[:100]}")
                continue
            results.append((t, bq, bk, ck))
            log(f"bq={bq} bk={bk} ck={ck}: bwd {t*1e3:.3f} ms "
                f"(total {((t_fwd+t)*1e3):.3f})")

    results.sort()
    log("--- top 5 ---")
    for t, bq, bk, ck in results[:5]:
        log(f"bq={bq} bk={bk} ck={ck}: bwd {t*1e3:.3f} ms, "
            f"fwd+bwd {(t_fwd+t)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
