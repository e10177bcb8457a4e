"""Gradient support (quantized forward / exact recomputed backward)."""

import jax
import jax.numpy as jnp
import numpy as np

import sageattention_tpu as sa
from sageattention_tpu.ops import reference


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


class TestGrad:
    def test_grad_matches_exact_attention_grad(self):
        q, k, v = (rand(i, (1, 2, 128, 64)) for i in range(3))

        def loss_sage(q, k, v):
            return jnp.sum(sa.sageattn(q, k, v, pv_dtype="bf16") ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(
                reference.attention_reference(q, k, v) ** 2
            )

        g_sage = jax.grad(loss_sage, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        # the cotangent entering the bwd comes from the quantized output,
        # so gradients match to quantization error, not exactly
        for gs, gr in zip(g_sage, g_ref):
            cos = float(
                jnp.sum(gs * gr)
                / (jnp.linalg.norm(gs) * jnp.linalg.norm(gr))
            )
            assert cos > 0.99

    def test_grad_causal(self):
        q, k, v = (rand(i + 5, (1, 2, 128, 32)) for i in range(3))
        g = jax.grad(
            lambda q: jnp.sum(sa.sageattn(q, k, v, is_causal=True))
        )(q)
        assert g.shape == q.shape
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_value_and_grad_through_model_step(self):
        """The dryrun training-step contract in miniature."""
        from sageattention_tpu import models
        from sageattention_tpu.models.configs import MODEL_CONFIGS

        cfg = MODEL_CONFIGS["llm-7b"].scaled(
            depth=1, hidden=128, heads=4, kv_heads=4, head_dim=32,
            vocab=256, mlp_hidden=256,
        )
        model = models.CausalLM(cfg)
        toks = jax.random.randint(jax.random.PRNGKey(0), (1, 128), 0, 256)
        params = model.init(jax.random.PRNGKey(1), toks)

        def loss_fn(p):
            logits = model.apply(p, toks)
            return jnp.mean(logits**2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert jnp.isfinite(loss)
        flat = jax.tree.leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
        assert any(float(jnp.max(jnp.abs(g))) > 0 for g in flat)


class TestFusedBackward:
    """The fused Pallas backward (quantized-forward straight-through VJP)."""

    def test_matches_exact_gradients(self):
        from sageattention_tpu.ops import attention_bwd_pallas

        q, k, v = (rand(i + 20, (1, 2, 256, 64)) for i in range(3))
        do = rand(30, (1, 2, 256, 64))
        got = attention_bwd_pallas.quantized_attention_vjp(
            q, k, v, do, is_causal=True, sm_scale=None, interpret=True
        )
        assert got is not None
        _, vjp = jax.vjp(
            lambda q, k, v: reference.attention_reference(
                q, k, v, is_causal=True
            ),
            q, k, v,
        )
        ref = vjp(do)
        for g, r in zip(got, ref):
            c = float(jnp.sum(g * r)
                      / (jnp.linalg.norm(g) * jnp.linalg.norm(r)))
            assert c > 0.999

    def test_k_quant_group_matches_forward_chunk(self):
        """Regression: the backward must re-quantize K with the FORWARD's
        chunk width (default_config), not its own.  At s=2048 non-causal
        the forward group is 2048 while the old backward used 1024 —
        the recomputed P rows then failed to sum to 1 and the smooth-k
        mean leaked into dQ.  A large K mean makes that leak dominant."""
        from sageattention_tpu.ops import attention_bwd_pallas, reference

        q, k, v = (rand(i + 40, (1, 1, 2048, 64)) for i in range(3))
        k = k + 3.0  # substantial mean: any rowsum(dS) != 0 leaks km
        do = rand(44, (1, 1, 2048, 64))
        got = attention_bwd_pallas.quantized_attention_vjp(
            q, k, v, do, is_causal=False, sm_scale=None, interpret=True
        )
        assert got is not None
        _, vjp = jax.vjp(
            lambda q, k, v: reference.attention_reference(q, k, v), q, k, v
        )
        ref = vjp(do)
        for g, r in zip(got, ref):
            c = float(jnp.sum(g * r)
                      / (jnp.linalg.norm(g) * jnp.linalg.norm(r)))
            assert c > 0.999

    def test_quant_residual_reuse_matches_requant(self, monkeypatch):
        """The custom_vjp forward stashes the quantized K/V codes + raw
        lse2 (core residual_sink) and the backward reuses them instead
        of re-quantizing.  The reuse path must agree with the
        re-quantize path (both are straight-through grads of the same
        quantized forward) and with exact fp32 attention."""
        from sageattention_tpu import core, sageattn
        from sageattention_tpu.ops import autodiff, reference

        b, h, s, d = 1, 2, 256, 64
        q, k, v = (rand(i + 70, (b, h, s, d)) for i in range(3))
        do = rand(74, (b, h, s, d))

        # the sink fills with the expected keys on the pallas path
        sink = {}
        core._entry(q, k, v, is_causal=True, return_lse=True,
                    residual_sink=sink)
        assert sink.get("k_i8") is not None
        assert sink.get("k_scale") is not None
        assert sink.get("v_q") is not None
        assert sink.get("lse2") is not None

        f = lambda q, k, v: sageattn(q, k, v, is_causal=True)
        _, vjp = jax.vjp(f, q, k, v)
        g_res = vjp(do)

        monkeypatch.setattr(autodiff, "_SAVE_QUANT_RES", False)
        autodiff._cached.cache_clear()  # closures captured the flag
        try:
            _, vjp = jax.vjp(f, q, k, v)
            g_req = vjp(do)
        finally:
            autodiff._cached.cache_clear()

        _, vjpe = jax.vjp(
            lambda q, k, v: reference.attention_reference(
                q, k, v, is_causal=True), q, k, v)
        g_ex = vjpe(do)
        for gr, gq, ge in zip(g_res, g_req, g_ex):
            c_rq = float(jnp.sum(gr * gq)
                         / (jnp.linalg.norm(gr) * jnp.linalg.norm(gq)))
            c_ex = float(jnp.sum(gr * ge)
                         / (jnp.linalg.norm(gr) * jnp.linalg.norm(ge)))
            assert c_rq > 0.999, c_rq
            assert c_ex > 0.999, c_ex

    def test_nhd_layout_gradients(self):
        """Regression: differentiable path must transpose NHD before the
        VJP (gradients previously treated axis 1 as heads)."""
        from sageattention_tpu.ops import autodiff

        q, k, v = (rand(i + 50, (1, 2, 128, 64)) for i in range(3))

        def loss_hnd(q, k, v):
            return jnp.sum(autodiff.differentiable_sageattn(q, k, v) ** 2)

        def loss_nhd(q, k, v):
            o = autodiff.differentiable_sageattn(
                jnp.swapaxes(q, 1, 2),
                jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2),
                tensor_layout="NHD",
            )
            return jnp.sum(jnp.swapaxes(o, 1, 2) ** 2)

        g_h = jax.grad(loss_hnd, argnums=(0, 1, 2))(q, k, v)
        g_n = jax.grad(loss_nhd, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_h, g_n):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    def test_gqa_group_sum_in_kernel(self):
        """GQA backward: dK/dV group-sum inside the dkv kernel grid
        (O(hkv) memory, no jnp.repeat); must match the exact VJP."""
        from sageattention_tpu.ops import attention_bwd_pallas, reference

        q = rand(60, (1, 4, 256, 64))
        k, v = rand(61, (1, 2, 256, 64)), rand(62, (1, 2, 256, 64))
        do = rand(63, (1, 4, 256, 64))
        got = attention_bwd_pallas.quantized_attention_vjp(
            q, k, v, do, is_causal=True, sm_scale=None, interpret=True
        )
        assert got is not None
        assert got[1].shape == k.shape and got[2].shape == v.shape

        def exact(q, k, v):
            kr = jnp.repeat(k, 2, axis=1)
            vr = jnp.repeat(v, 2, axis=1)
            return reference.attention_reference(q, kr, vr, is_causal=True)

        _, vjp = jax.vjp(exact, q, k, v)
        ref = vjp(do)
        for g, r in zip(got, ref):
            c = float(jnp.sum(g * r)
                      / (jnp.linalg.norm(g) * jnp.linalg.norm(r)))
            assert c > 0.999

    def test_return_lse_gradients_fused(self):
        """return_lse=True backward rides the fused kernels: the LSE
        cotangent folds into the D vector (dS = P*(dP - (D - dlse))),
        plus the smooth-k correction term — no score materialization."""
        from sageattention_tpu.ops import autodiff, reference

        q, k, v = (rand(i + 70, (1, 2, 256, 64)) for i in range(3))
        w = rand(73, (1, 2, 256))  # weight so dlse is nontrivial

        def loss_sage(q, k, v):
            o, lse = autodiff.differentiable_sageattn(
                q, k, v, return_lse=True
            )
            return jnp.sum(o**2) + jnp.sum(w * lse**2)

        def loss_ref(q, k, v):
            o, lse = reference.attention_reference(q, k, v, return_lse=True)
            return jnp.sum(o**2) + jnp.sum(w * lse**2)

        g_sage = jax.grad(loss_sage, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gs, gr in zip(g_sage, g_ref):
            cos = float(
                jnp.sum(gs * gr)
                / (jnp.linalg.norm(gs) * jnp.linalg.norm(gr))
            )
            assert cos > 0.99

    def test_unfit_shape_returns_none(self):
        from sageattention_tpu.ops import attention_bwd_pallas

        q, k, v = (rand(i, (1, 2, 200, 64)) for i in range(3))
        do = rand(3, (1, 2, 200, 64))
        assert attention_bwd_pallas.quantized_attention_vjp(
            q, k, v, do, is_causal=False, sm_scale=None, interpret=True
        ) is None


class TestWindowedBackward:
    def test_fused_window_backward_band_grids(self):
        """Window backward with blocks chosen so BOTH band grids engage
        (dq kv-axis 3 of 4 blocks, dkv q-axis 6 of 8): the shrunk grids
        must reproduce the banded exact gradients."""
        from sageattention_tpu import quant as quant_mod
        from sageattention_tpu.ops import (
            attention_bwd_pallas,
            attention_pallas,
            reference,
        )

        s, W, d = 1024, 300, 64
        q, k, v = (rand(i + 95, (1, 2, s, d)) for i in range(3))
        do = rand(99, (1, 2, s, d))
        sm = d**-0.5
        LOG2E = 1.4426950408889634

        km = jnp.mean(k, axis=-2)
        k_sm = (k - km[..., None, :])
        q_i8, q_scale = quant_mod.quant_int8(
            q, granularity="per_token", scale_fold=sm * LOG2E
        )
        k_i8, k_scale = quant_mod.quant_int8_block_scales(
            k_sm, group=256
        )
        o, lse2 = attention_pallas.sage_attention_fused(
            q_i8, q_scale, k_i8, k_scale, v.astype(jnp.bfloat16),
            is_causal=True, pv_dtype="bf16", return_lse=True,
            block_q=256, block_k=256, chunk_k=256, window=W,
            interpret=True,
        )
        dq, dk, dv = attention_bwd_pallas.sage_attention_bwd(
            q_i8, q_scale, k_i8, k_scale,
            k_sm.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), o, lse2, do,
            is_causal=True, sm_scale=sm, block_q=128, block_k=256,
            chunk_k=256, scale_group=256, window=W, interpret=True,
        )

        band = (jnp.arange(s)[None, :] > jnp.arange(s)[:, None] - W)
        band = band[None, None]

        def exact(q, k, v):
            return reference.attention_reference(
                q, k, v, is_causal=True, attn_mask=band
            )

        _, vjp = jax.vjp(exact, q, k, v)
        ref = vjp(do)
        for g, r in zip((dq, dk, dv), ref):
            c = float(jnp.sum(g * r)
                      / (jnp.linalg.norm(g) * jnp.linalg.norm(r)))
            assert c > 0.999

    def test_fused_causal_backward_fold_grid(self):
        """Causal dq at a shape that rides the fold grid (n_q=4, r=4:
        q rows pack pairwise into all-live grid rows) vs the exact
        reference."""
        from sageattention_tpu.ops import attention_bwd_pallas, reference

        q, k, v = (rand(i + 90, (1, 2, 2048, 64)) for i in range(3))
        do = rand(94, (1, 2, 2048, 64))
        got = attention_bwd_pallas.quantized_attention_vjp(
            q, k, v, do, is_causal=True, sm_scale=None, interpret=True,
        )
        assert got is not None

        def exact(q, k, v):
            return reference.attention_reference(q, k, v, is_causal=True)

        _, vjp = jax.vjp(exact, q, k, v)
        ref = vjp(do)
        for g, r in zip(got, ref):
            c = float(jnp.sum(g * r)
                      / (jnp.linalg.norm(g) * jnp.linalg.norm(r)))
            assert c > 0.999

    def test_fused_causal_backward_cross_length(self):
        """Causal sq != sk through the fused kernels (both directions).
        sq > sk used to mis-engage the fold grid (unfired epilogues);
        sk > sq used to emit out-of-range q-block DMAs in the dkv maps."""
        from sageattention_tpu import quant as quant_mod
        from sageattention_tpu.ops import (
            attention_bwd_pallas,
            attention_pallas,
            reference,
        )

        LOG2E = 1.4426950408889634
        for sq, sk in ((1024, 512), (256, 1024)):
            d = 64
            q = rand(70, (1, 2, sq, d))
            k = rand(71, (1, 2, sk, d))
            v = rand(72, (1, 2, sk, d))
            do = rand(73, (1, 2, sq, d))
            sm = d**-0.5
            km = jnp.mean(k, axis=-2)
            k_sm = k - km[..., None, :]
            q_i8, q_scale = quant_mod.quant_int8(
                q, granularity="per_token", scale_fold=sm * LOG2E
            )
            k_i8, k_scale = quant_mod.quant_int8_block_scales(
                k_sm, group=256
            )
            o, lse2 = attention_pallas.sage_attention_fused(
                q_i8, q_scale, k_i8, k_scale, v.astype(jnp.bfloat16),
                is_causal=True, pv_dtype="bf16", return_lse=True,
                block_q=min(256, sq), block_k=256, chunk_k=256,
                interpret=True,
            )
            dq, dk, dv = attention_bwd_pallas.sage_attention_bwd(
                q_i8, q_scale, k_i8, k_scale,
                k_sm.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16), o, lse2, do,
                is_causal=True, sm_scale=sm, block_q=128, block_k=256,
                chunk_k=256, scale_group=256, interpret=True,
            )

            def exact(q, k, v):
                return reference.attention_reference(
                    q, k, v, is_causal=True
                )

            _, vjp = jax.vjp(exact, q, k, v)
            ref = vjp(do)
            for name, g, r in zip("qkv", (dq, dk, dv), ref):
                c = float(jnp.sum(g * r)
                          / (jnp.linalg.norm(g) * jnp.linalg.norm(r)))
                assert c > 0.999, (sq, sk, name, c)
                assert bool(jnp.isfinite(g).all()), (sq, sk, name)

    def test_fused_window_backward_band_overrun(self):
        """Window band grid where late q rows' windows lie wholly past
        the KV length: their dq must be exactly zero (the epilogue used
        to never fire, returning garbage), live rows match the banded
        reference."""
        from sageattention_tpu import quant as quant_mod
        from sageattention_tpu.ops import (
            attention_bwd_pallas,
            attention_pallas,
            reference,
        )

        LOG2E = 1.4426950408889634
        sq, sk, W, d = 1024, 512, 128, 64
        q = rand(75, (1, 2, sq, d))
        k = rand(76, (1, 2, sk, d))
        v = rand(77, (1, 2, sk, d))
        do = rand(78, (1, 2, sq, d))
        sm = d**-0.5
        km = jnp.mean(k, axis=-2)
        k_sm = k - km[..., None, :]
        q_i8, q_scale = quant_mod.quant_int8(
            q, granularity="per_token", scale_fold=sm * LOG2E
        )
        k_i8, k_scale = quant_mod.quant_int8_block_scales(k_sm, group=128)
        o, lse2 = attention_pallas.sage_attention_fused(
            q_i8, q_scale, k_i8, k_scale, v.astype(jnp.bfloat16),
            is_causal=True, pv_dtype="bf16", return_lse=True,
            block_q=128, block_k=128, chunk_k=128, window=W,
            interpret=True,
        )
        dq, dk, dv = attention_bwd_pallas.sage_attention_bwd(
            q_i8, q_scale, k_i8, k_scale,
            k_sm.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), o, lse2, do,
            is_causal=True, sm_scale=sm, block_q=128, block_k=128,
            chunk_k=128, scale_group=128, window=W, interpret=True,
        )
        # rows whose window [i-W+1, i] starts past the last key see
        # nothing: gradient exactly 0
        dead_from = sk + W  # first row with window start >= sk
        assert float(jnp.max(jnp.abs(dq[:, :, dead_from:]))) == 0.0
        # live rows match the banded reference
        band = jnp.logical_and(
            jnp.arange(sk)[None, :] <= jnp.arange(sq)[:, None],
            jnp.arange(sk)[None, :] > jnp.arange(sq)[:, None] - W,
        )[None, None]

        def exact(q, k, v):
            return reference.attention_reference(q, k, v, attn_mask=band)

        _, vjp = jax.vjp(exact, q, k, v)
        # the reference's fully-masked rows degenerate to a uniform
        # softmax whose vjp pollutes dK/dV; the kernel correctly gives
        # them zero weight — zero their cotangent for the comparison
        do_live = do.at[:, :, dead_from:].set(0.0)
        ref = vjp(do_live)
        live = slice(0, sk)  # rows fully inside the key range
        c = float(
            jnp.sum(dq[:, :, live] * ref[0][:, :, live])
            / (jnp.linalg.norm(dq[:, :, live])
               * jnp.linalg.norm(ref[0][:, :, live]))
        )
        assert c > 0.999, c
        for g, r in zip((dk, dv), ref[1:]):
            c = float(jnp.sum(g * r)
                      / (jnp.linalg.norm(g) * jnp.linalg.norm(r)))
            assert c > 0.999, c

    def test_fused_window_backward_multiblock(self):
        """Sliding-window gradients through the fused kernels at a
        multi-q-block shape, vs the banded exact reference."""
        from sageattention_tpu.ops import attention_bwd_pallas, reference

        q, k, v = (rand(i + 80, (1, 2, 1024, 64)) for i in range(3))
        do = rand(84, (1, 2, 1024, 64))
        W = 200
        got = attention_bwd_pallas.quantized_attention_vjp(
            q, k, v, do, is_causal=True, sm_scale=None, window=W,
            interpret=True,
        )
        assert got is not None

        band = (jnp.arange(1024)[None, :]
                > jnp.arange(1024)[:, None] - W)[None, None]

        def exact(q, k, v):
            return reference.attention_reference(
                q, k, v, is_causal=True, attn_mask=band
            )

        _, vjp = jax.vjp(exact, q, k, v)
        ref = vjp(do)
        for g, r in zip(got, ref):
            c = float(jnp.sum(g * r)
                      / (jnp.linalg.norm(g) * jnp.linalg.norm(r)))
            assert c > 0.999


class TestBiasGradients:
    def test_bias_path_differentiable_all_args(self):
        """sageattn(attn_bias=...) is differentiable w.r.t. q/k/v AND
        the bias (beyond the forward-only reference); gradients match
        the exact reference VJP."""
        q, k, v = (rand(i + 90, (1, 2, 128, 64)) for i in range(3))
        bias = rand(93, (1, 2, 128, 128)) * 0.5
        do = rand(94, (1, 2, 128, 64))

        f = lambda q, k, v, b: jnp.vdot(
            sa.sageattn(q, k, v, attn_bias=b), do)
        g = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, bias)
        fe = lambda q, k, v, b: jnp.vdot(
            reference.attention_reference(q, k, v, attn_bias=b), do)
        ge = jax.grad(fe, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, r in zip(g, ge):
            c = float(jnp.sum(a * r)
                      / (jnp.linalg.norm(a) * jnp.linalg.norm(r) + 1e-30))
            assert c > 0.999, c

    def test_fused_bias_backward_blockwise(self):
        """Per-head full-shape biases ride the FUSED backward with a
        blockwise dS (== dBias) output — no score-sized temporaries
        beyond the bias cotangent; parity vs the exact VJP across
        causal / non-causal / GQA."""
        from sageattention_tpu import core
        from sageattention_tpu.ops import attention_bwd_pallas

        for causal, hkv in [(False, 2), (True, 2), (False, 1)]:
            b, h, s, d = 1, 2, 256, 64
            q = rand(100, (b, h, s, d))
            k = rand(101, (b, hkv, s, d))
            v = rand(102, (b, hkv, s, d))
            bias = rand(103, (b, h, s, s)) * 0.5
            do = rand(104, (b, h, s, d))
            o, lse = core._entry(
                q, k, v, is_causal=causal, return_lse=True,
                attn_bias=bias, pv_dtype="bf16",
            )
            got = attention_bwd_pallas.quantized_attention_vjp(
                q, k, v, do, is_causal=causal, sm_scale=None,
                o=o, lse_nat=lse, attn_bias=bias, need_dbias=True,
                pv_dtype="bf16", interpret=True,
            )
            assert got is not None, (causal, hkv)

            def exact(q, k, v, bias):
                return reference.attention_reference(
                    q, k, v, is_causal=causal, attn_bias=bias
                )

            _, vjp = jax.vjp(exact, q, k, v, bias)
            ref = vjp(do)
            for g, r in zip(got, ref):
                c = float(jnp.sum(g * r)
                          / (jnp.linalg.norm(g) * jnp.linalg.norm(r)
                             + 1e-30))
                assert c > 0.999, (causal, hkv, c)
