"""Focused follow-up to sweep_bwd: edge configs + the honest flash
fwd+bwd baseline (all three grads consumed) at b4 h16 s4096 hd128."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    hd = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from bench.utils import device_time_carry
    from sageattention_tpu.ops import (
        attention_bwd_pallas, attention_pallas, quant_pallas,
    )

    b, h, s, d = 4, 16, 4096, hd
    LOG2E = attention_bwd_pallas.LOG2E
    sm_scale = d**-0.5
    q, k, v, do = (
        jax.random.normal(jax.random.PRNGKey(i), (b, h, s, d))
        for i in range(4)
    )

    use_vt = attention_pallas.vt_eligible_head_dim(d)
    fbq, fbk, fsub, scale_group = attention_pallas.default_config(
        s, s, d, True, vt=use_vt
    )

    @jax.jit
    def prep(q, k, v):
        km = jnp.mean(k.astype(jnp.float32), axis=-2)
        q_i8, q_scale = quant_pallas.quant_q_per_token(
            q, scale_fold=sm_scale * LOG2E)
        k_i8, k_scale = quant_pallas.quant_k_chunked(
            k, km, group=scale_group)
        k_sm = (k.astype(jnp.float32) - km[..., None, :]).astype(
            jnp.bfloat16)
        return q_i8, q_scale, k_i8, k_scale, k_sm

    q_i8, q_scale, k_i8, k_scale, k_sm = jax.block_until_ready(
        prep(q, k, v))
    v_bf = v.astype(jnp.bfloat16)

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

    o, lse2 = jax.block_until_ready(jax.jit(fwd_rec)(
        q_i8, q_scale, k_i8, k_scale, v_bf))
    qbf = q.astype(jnp.bfloat16)
    dobf = do.astype(jnp.bfloat16)

    import ast
    cfgs = (ast.literal_eval(sys.argv[2]) if len(sys.argv) > 2 else
            ((512, 512, 512), (512, 512, 256),
             (1024, 1024, 1024), (1024, 2048, 1024),
             (512, 1024, 1024)))
    for bq, bk, ck in cfgs:
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
            return (dq[:1, 0, 0, 0] + dk[:1, 0, 0, 0]
                    + dv[:1, 0, 0, 0])

        try:
            t = device_time_carry(
                bwd_one, dobf,
                (q_i8, q_scale, k_i8, k_scale, k_sm, qbf, v_bf, o,
                 lse2), n=5)
            log(f"bq={bq} bk={bk} ck={ck}: bwd {t*1e3:.3f} ms")
        except Exception as e:
            log(f"bq={bq} bk={bk} ck={ck}: FAIL "
                f"{type(e).__name__}: {str(e)[:120]}")

    # honest flash fwd+bwd baseline (all grads consumed)
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    def fit(sv, cands):
        for c in cands:
            if sv % c == 0:
                return c
        return 128

    bq_ = fit(s, (512, 256, 128))
    bk_ = fit(s, (1024, 512, 256, 128))
    bkm = fit(s, (2048, 1024, 512, 256, 128))
    bs = BlockSizes(
        block_q=bq_, block_k_major=bkm, block_k=bk_, block_b=1,
        block_q_major_dkv=bq_, block_k_major_dkv=bkm,
        block_k_dkv=bk_, block_q_dkv=bq_,
        block_k_major_dq=bkm, block_k_dq=bk_, block_q_dq=bq_,
    )

    def flash_train(q, k, v, do):
        f = lambda q, k, v: flash_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), causal=True, block_sizes=bs)
        _, vjp = jax.vjp(f, q, k, v)
        dq, dk, dv = vjp(do.astype(jnp.bfloat16))
        return dq[:1, 0, 0, 0] + dk[:1, 0, 0, 0] + dv[:1, 0, 0, 0]

    t_fl = device_time_carry(flash_train, q, (k, v, do), n=5)
    log(f"flash fwd+bwd (all grads): {t_fl*1e3:.3f} ms")

    # honest sage end-to-end vjp with the winning config comes from
    # probe_train once the winner is baked into _fit_block.
    log("done")


if __name__ == "__main__":
    main()
