"""Fused Pallas kernel vs the unfused oracle (interpret mode on CPU).

The correctness contract: with pv_dtype='bf16' the fused online-softmax
kernel must match the unfused quantized oracle to fp32-roundoff; with
quantized PV it must match the fp32 reference to high cosine similarity
(the accuracy contract of BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu import quant
from sageattention_tpu.ops import reference
from sageattention_tpu.ops.attention_pallas import sage_attention_fused

LOG2E = 1.4426950408889634


def rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape) * scale


def make_inputs(b=1, h=2, hkv=None, sq=256, sk=256, d=64, seed=0):
    hkv = hkv or h
    q = rand(seed, (b, h, sq, d))
    k = rand(seed + 1, (b, hkv, sk, d))
    v = rand(seed + 2, (b, hkv, sk, d))
    return q, k, v


def quantize_all(q, k, v, sm_scale=None, pv="bf16", smooth_v=False):
    d = q.shape[-1]
    sm_scale = sm_scale or d**-0.5
    q_i8, qs, k_i8, ks, km = quant.quantize_qk(q, k, sm_scale=sm_scale)
    v_scale = v_mean = None
    if pv == "int8":
        v_q, v_scale, v_mean = quant.per_channel_quant(
            v, dtype=jnp.int8, smooth=smooth_v
        )
    elif pv == "fp8":
        v_q, v_scale, v_mean = quant.per_channel_quant(
            v, dtype=jnp.float8_e4m3fn, smooth=smooth_v
        )
    else:
        v_q = v.astype(jnp.bfloat16)
    return q_i8, qs, k_i8, ks, v_q, v_scale, v_mean


def cosine(a, b):
    a = jnp.asarray(a, jnp.float32).ravel()
    b = jnp.asarray(b, jnp.float32).ravel()
    return float(jnp.dot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))


class TestFusedVsOracle:
    @pytest.mark.parametrize("is_causal", [False, True])
    def test_bf16_pv(self, is_causal):
        q, k, v = make_inputs()
        q_i8, qs, k_i8, ks, v_q, _, _ = quantize_all(q, k, v)
        o = sage_attention_fused(
            q_i8, qs, k_i8, ks, v_q,
            is_causal=is_causal, pv_dtype="bf16", interpret=True,
            out_dtype=jnp.float32,
        )
        o_ref = reference.quantized_attention_reference(
            q_i8, qs, k_i8, ks, v_q, is_causal=is_causal,
            out_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-2)
        assert cosine(o, o_ref) > 0.9999

    def test_lse(self):
        q, k, v = make_inputs(seed=10)
        q_i8, qs, k_i8, ks, v_q, _, _ = quantize_all(q, k, v)
        o, lse2 = sage_attention_fused(
            q_i8, qs, k_i8, ks, v_q,
            pv_dtype="bf16", return_lse=True, interpret=True,
            out_dtype=jnp.float32,
        )
        _, lse2_ref = reference.quantized_attention_reference(
            q_i8, qs, k_i8, ks, v_q, return_lse=True, out_dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(lse2), np.asarray(lse2_ref), atol=1e-3
        )

    def test_gqa(self):
        q, k, v = make_inputs(h=4, hkv=2, seed=20)
        q_i8, qs, k_i8, ks, v_q, _, _ = quantize_all(q, k, v)
        o = sage_attention_fused(
            q_i8, qs, k_i8, ks, v_q, pv_dtype="bf16", interpret=True,
            out_dtype=jnp.float32,
        )
        o_ref = reference.quantized_attention_reference(
            q_i8, qs, k_i8, ks, v_q, out_dtype=jnp.float32
        )
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-2)

    def test_segments(self):
        q, k, v = make_inputs(sq=256, sk=256, seed=30)
        seg = jnp.repeat(jnp.arange(2, dtype=jnp.int32), 128)[None]
        q_i8, qs, k_i8, ks, v_q, _, _ = quantize_all(q, k, v)
        o = sage_attention_fused(
            q_i8, qs, k_i8, ks, v_q,
            q_segment_ids=seg, kv_segment_ids=seg,
            pv_dtype="bf16", interpret=True, out_dtype=jnp.float32,
        )
        o_ref = reference.quantized_attention_reference(
            q_i8, qs, k_i8, ks, v_q,
            q_segment_ids=seg, kv_segment_ids=seg, out_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-2)

    def test_int8_pv_with_vscale_and_vmean(self):
        q, k, v = make_inputs(seed=40)
        v = v + 3.0  # nonzero channel means exercise smooth_v
        q_i8, qs, k_i8, ks, v_q, vs, vm = quantize_all(
            q, k, v, pv="int8", smooth_v=True
        )
        o = sage_attention_fused(
            q_i8, qs, k_i8, ks, v_q, vs, vm,
            pv_dtype="int8", interpret=True, out_dtype=jnp.float32,
        )
        o_ref = reference.attention_reference(
            q, k, v, sm_scale=q.shape[-1] ** -0.5
        )
        assert cosine(o, o_ref) > 0.999
        assert float(jnp.max(jnp.abs(o - o_ref))) < 0.15

    def test_int8_pv_accuracy_vs_fp32(self):
        q, k, v = make_inputs(seed=50)
        q_i8, qs, k_i8, ks, v_q, vs, vm = quantize_all(q, k, v, pv="int8")
        o = sage_attention_fused(
            q_i8, qs, k_i8, ks, v_q, vs,
            pv_dtype="int8", interpret=True, out_dtype=jnp.float32,
        )
        o_ref = reference.attention_reference(q, k, v)
        assert cosine(o, o_ref) > 0.999

    def test_causal_matches_fp32_reference(self):
        q, k, v = make_inputs(seed=60)
        q_i8, qs, k_i8, ks, v_q, vs, _ = quantize_all(q, k, v, pv="int8")
        o = sage_attention_fused(
            q_i8, qs, k_i8, ks, v_q, vs,
            is_causal=True, pv_dtype="int8", interpret=True,
            out_dtype=jnp.float32,
        )
        o_ref = reference.attention_reference(q, k, v, is_causal=True)
        assert cosine(o, o_ref) > 0.999

    def test_causal_fold_grid_multiblock(self):
        """Plain causal at equal multi-blocks rides the fold grid (q rows
        f and n_q-1-f packed into one grid row, every step live); odd
        n_q falls back to the rectangular grid.  Both must match the
        fp32 reference."""
        for sq, blk in ((512, 128), (640, 128)):  # n_q = 4 (fold), 5 (rect)
            q, k, v = make_inputs(sq=sq, sk=sq, seed=80)
            q_i8, qs, k_i8, ks, v_q, _, _ = quantize_all(q, k, v)
            o = sage_attention_fused(
                q_i8, qs, k_i8, ks, v_q,
                is_causal=True, pv_dtype="bf16", block_q=blk, block_k=blk,
                chunk_k=blk, interpret=True, out_dtype=jnp.float32,
            )
            o_ref = reference.attention_reference(q, k, v, is_causal=True)
            assert cosine(o, o_ref) > 0.999, (sq, blk)

    def test_rectangular_kv(self):
        q, k, v = make_inputs(sq=128, sk=384, seed=70)
        q_i8, qs, k_i8, ks, v_q, _, _ = quantize_all(q, k, v)
        o = sage_attention_fused(
            q_i8, qs, k_i8, ks, v_q, pv_dtype="bf16", interpret=True,
            out_dtype=jnp.float32,
        )
        o_ref = reference.quantized_attention_reference(
            q_i8, qs, k_i8, ks, v_q, out_dtype=jnp.float32
        )
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-2)


class TestInKernelKQuant:
    """k_inkernel: single-step kernels can quantize K from bf16 in
    scratch (bit-identical chain to quant_k_chunked).  Measured
    op-total-neutral, so core keeps the prologue; the capability stays
    tested here."""

    def test_matches_prologue_path(self):
        import numpy as np
        from sageattention_tpu import quant
        from sageattention_tpu.ops import attention_pallas as ap

        LOG2E = 1.4426950408889634
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 512, 64))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 512, 64)) + 1.0
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 512, 64))
        km = jnp.mean(k.astype(jnp.float32), axis=-2)
        sm = 64 ** -0.5
        k_sm = k.astype(jnp.float32) - km[..., None, :]
        ki, ks = quant.quant_int8_block_scales(k_sm, group=512)
        o_ref = ap.sage_attention_fused(
            q.astype(jnp.float32), None, ki, ks, v.astype(jnp.bfloat16),
            q_fold=sm * LOG2E, pv_dtype="bf16",
            block_q=256, block_k=512, chunk_k=512, interpret=True,
        )
        o_fused = ap.sage_attention_fused(
            q.astype(jnp.float32), None, k.astype(jnp.float32), None,
            v.astype(jnp.bfloat16), k_mean=km, k_inkernel=True,
            q_fold=sm * LOG2E, pv_dtype="bf16",
            block_q=256, block_k=512, chunk_k=512, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(o_fused, np.float32), np.asarray(o_ref, np.float32)
        )
