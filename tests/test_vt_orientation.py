"""Transposed-formulation (vt) kernel parity vs the normal orientation.

The d<=64 MXU rescue (`attention_pallas.sage_attention_fused(vt=True)`)
computes S^T = K.Q^T and O^T = V^T.P^T; these tests drive both
orientations on identical quantized inputs (interpret mode) and assert
output equality to fp rounding plus cosine fidelity vs the fp32 oracle,
across: single/multi-step grids, the causal fold grid, GQA, block-
aligned windows (band grid), in-kernel Q quantization, and LSE output.
Measured motivation + on-hardware numbers: BASELINE.md "hd64" section.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu import quant
from sageattention_tpu.ops.attention_pallas import sage_attention_fused

LOG2E = 1.4426950408889634


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


def _run_pair(b, h, s, d, causal, bq, bk, sub, ck, hkv=None, window=None,
              q_fold_mode=False, return_lse=False):
    hkv = hkv or h
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, s, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, hkv, s, d),
                          jnp.float32)
    q_i8, qs = quant.quant_int8(
        q.astype(jnp.bfloat16), granularity="per_token",
        scale_fold=d**-0.5 * LOG2E)
    k_i8, ks = quant.quant_int8_block_scales(
        k.astype(jnp.bfloat16), group=ck)
    v_q, vs, _ = quant.per_channel_quant(
        v.astype(jnp.bfloat16), dtype=jnp.int8)

    kw = dict(is_causal=causal, pv_dtype="int8", block_q=bq, block_k=bk,
              sub_q=sub, chunk_k=ck, window=window,
              return_lse=return_lse, interpret=True)
    if q_fold_mode:
        a_n = dict(q_i8=q.astype(jnp.bfloat16), q_scale=None,
                   q_fold=d**-0.5 * LOG2E)
        a_t = dict(q_i8=jnp.swapaxes(q.astype(jnp.bfloat16), 2, 3),
                   q_scale=None, q_fold=d**-0.5 * LOG2E)
    else:
        a_n = dict(q_i8=q_i8, q_scale=qs)
        a_t = dict(q_i8=jnp.swapaxes(q_i8, 2, 3), q_scale=qs)

    o_n = sage_attention_fused(
        k_i8=k_i8, k_scale=ks, v_q=v_q, v_scale=vs, **a_n, **kw)
    o_t = sage_attention_fused(
        k_i8=k_i8, k_scale=ks, v_q=jnp.swapaxes(v_q, 2, 3), v_scale=vs,
        vt=True, **a_t, **kw)
    if return_lse:
        (o_n, lse_n), (o_t, lse_t) = o_n, o_t
        np.testing.assert_allclose(
            np.asarray(lse_n), np.asarray(lse_t), rtol=1e-4, atol=1e-4
        )

    g = h // hkv
    kr = jnp.repeat(k, g, axis=1)
    vr = jnp.repeat(v, g, axis=1)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, kr) * d**-0.5
    if causal:
        ii = jnp.arange(s)
        m = ii[:, None] >= ii[None, :]
        if window is not None:
            m = jnp.logical_and(m, ii[None, :] > ii[:, None] - window)
        sc = jnp.where(m, sc, -1e30)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), vr)

    assert _cos(o_t, ref) > 0.999
    np.testing.assert_allclose(
        np.asarray(o_n, np.float32), np.asarray(o_t, np.float32),
        rtol=2e-2, atol=2e-3,
    )


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("single_step", dict(s=512, causal=False, bq=256, bk=512)),
        ("single_step_causal", dict(s=512, causal=True, bq=256, bk=512)),
        ("multi_step", dict(s=1024, causal=False, bq=256, bk=256)),
        ("fold_grid", dict(s=1024, causal=True, bq=256, bk=256)),
        ("gqa", dict(s=512, causal=False, bq=256, bk=512, h=4, hkv=2)),
        ("band_window", dict(s=2048, causal=True, bq=256, bk=256,
                             window=512)),
        ("q_fold", dict(s=512, causal=False, bq=256, bk=512,
                        q_fold_mode=True)),
        ("lse", dict(s=512, causal=False, bq=256, bk=512,
                     return_lse=True)),
        ("fold_lse", dict(s=1024, causal=True, bq=256, bk=256,
                          return_lse=True)),
    ],
)
def test_vt_matches_normal(name, kwargs):
    kwargs = dict(kwargs)
    h = kwargs.pop("h", 2)
    _run_pair(1, h, kwargs.pop("s"), 64, kwargs.pop("causal"),
              kwargs.pop("bq"), kwargs.pop("bk"), 128, 256, **kwargs)
def test_vt_rejects_unsupported():
    q = jnp.zeros((1, 1, 64, 256), jnp.int8)   # transposed [b,h,d,sq]
    k = jnp.zeros((1, 1, 256, 64), jnp.int8)
    v = jnp.zeros((1, 1, 64, 256), jnp.int8)
    ks = jnp.ones((1, 1, 1), jnp.float32)
    qs = jnp.ones((1, 1, 256), jnp.float32)
    mask = jnp.ones((1, 1, 256, 256), jnp.int8)
    with pytest.raises(ValueError, match="vt=True does not support"):
        sage_attention_fused(
            q, qs, k, ks, v, attn_mask_i8=mask, vt=True,
            block_q=256, block_k=256, chunk_k=256, interpret=True,
        )
    # per-row K scales are normal-orientation-only
    ks_row = jnp.ones((1, 1, 256), jnp.float32)
    with pytest.raises(ValueError, match="per-chunk K scales"):
        sage_attention_fused(
            q, qs, k, ks_row, v, vt=True,
            block_q=256, block_k=256, chunk_k=256, interpret=True,
        )


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="the CPU backend cannot execute int4 converts (interpret "
           "mode traces but XLA-CPU rejects E(4) layouts); the on-TPU "
           "equivalent runs in tools/verify_tpu.py every verify pass",
)
def test_vt_int4_matches_normal_orientation():
    """qk_bits=4 under vt: the in-register s8->s4 narrowing and the int4
    MXU dot must commute with the transposed formulation (both
    orientations on identical +-7-quantized inputs)."""
    b, h, s, d = 1, 2, 512, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    q_i8, qs = quant.quant_int8(
        q.astype(jnp.bfloat16), granularity="per_token",
        scale_fold=d**-0.5 * LOG2E, bits=4)
    k_i8, ks = quant.quant_int8_block_scales(
        k.astype(jnp.bfloat16), group=256, bits=4)
    v_q, vs, _ = quant.per_channel_quant(
        v.astype(jnp.bfloat16), dtype=jnp.int8)
    kw = dict(is_causal=True, pv_dtype="int8", block_q=256, block_k=256,
              sub_q=128, chunk_k=256, qk_int4=True, interpret=True)
    o_n = sage_attention_fused(q_i8, qs, k_i8, ks, v_q, vs, **kw)
    o_t = sage_attention_fused(
        jnp.swapaxes(q_i8, 2, 3), qs, k_i8, ks,
        jnp.swapaxes(v_q, 2, 3), vs, vt=True, **kw)
    np.testing.assert_allclose(
        np.asarray(o_n, np.float32), np.asarray(o_t, np.float32),
        rtol=2e-2, atol=2e-3)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) * d**-0.5
    ii = jnp.arange(s)
    sc = jnp.where(ii[:, None] >= ii[None, :], sc, -1e30)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), v)
    # int4 QK loses ~1 bit vs int8; 0.99 is the bits=4 acceptance bar
    assert _cos(o_t, ref) > 0.99


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="int4 needs real TPU (see above); covered by verify_tpu",
)
def test_sageattn_int4_hd64_routes_vt():
    """Public-API qk_bits=4 at hd64 (now vt-dispatched) stays correct."""
    import sageattention_tpu as sa

    b, h, s, d = 1, 2, 256, 64
    q = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(4), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(5), (b, h, s, d), jnp.bfloat16)
    o = sa.sageattn(q, k, v, is_causal=True, qk_bits=4)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * d**-0.5
    ii = jnp.arange(s)
    sc = jnp.where(ii[:, None] >= ii[None, :], sc, -1e30)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1),
                     v.astype(jnp.float32))
    assert _cos(o, ref) > 0.99


def test_vt_segments_match_normal_orientation():
    """Contiguous segment masking under vt (r4): the vt kernel takes
    per-q-row live-KV RANGES (lo/hi); parity vs the normal orientation's
    id-form segments on a 2-segment varlen-style packing."""
    b, h, s, d = 1, 2, 768, 64
    seg = jnp.concatenate([
        jnp.full((b, 512), 2, jnp.int32), jnp.full((b, 256), 3, jnp.int32)
    ], axis=1)
    # range form of the same mask: rows of segment A see kv [0, 512),
    # rows of segment B see [512, 768)
    lo = jnp.where(seg == 2, 0, 512)
    hi = jnp.where(seg == 2, 512, 768)
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    q_i8, qs = quant.quant_int8(
        q.astype(jnp.bfloat16), granularity="per_token",
        scale_fold=d**-0.5 * LOG2E)
    k_i8, ks = quant.quant_int8_block_scales(
        k.astype(jnp.bfloat16), group=256)
    v_q, vs, _ = quant.per_channel_quant(
        v.astype(jnp.bfloat16), dtype=jnp.int8)
    for causal in (False, True):
        kw = dict(is_causal=causal, pv_dtype="int8", block_q=256,
                  block_k=256, sub_q=128, chunk_k=256, interpret=True)
        o_n = sage_attention_fused(
            q_i8, qs, k_i8, ks, v_q, vs,
            q_segment_ids=seg, kv_segment_ids=seg, **kw)
        o_t = sage_attention_fused(
            jnp.swapaxes(q_i8, 2, 3), qs, k_i8, ks,
            jnp.swapaxes(v_q, 2, 3), vs, vt=True,
            q_segment_ids=lo, kv_segment_ids=hi, **kw)
        np.testing.assert_allclose(
            np.asarray(o_n, np.float32), np.asarray(o_t, np.float32),
            rtol=2e-2, atol=2e-3)
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) * d**-0.5
        m = seg[:, None, :, None] == seg[:, None, None, :]
        if causal:
            ii = jnp.arange(s)
            m = jnp.logical_and(m, (ii[:, None] >= ii[None, :])[None, None])
        ref = jnp.einsum(
            "bhqk,bhkd->bhqd",
            jax.nn.softmax(jnp.where(m, sc, -1e30), -1), v)
        assert _cos(o_t, ref) > 0.999


def test_sageattn_ragged_hd64_routes_vt_with_pad_segments():
    """Public API with a non-128-multiple KV length at hd64: the pad
    segment ids must ride the vt kernel (r4) and crop correctly."""
    import sageattention_tpu as sa

    b, h, sq, sk, d = 1, 2, 300, 290, 64
    q = jax.random.normal(jax.random.PRNGKey(3), (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(4), (b, h, sk, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(5), (b, h, sk, d), jnp.bfloat16)
    o = sa.sageattn(q, k, v)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * d**-0.5
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1),
                     v.astype(jnp.float32))
    assert _cos(o, ref) > 0.999


def test_sageattn_ragged_causal_cross_length_pads_masked():
    """r4 regression: the vt range swap used to clobber the internally
    built ragged-pad ranges with None, so causal hd64 with sq > sk
    attended the zero-padded KV columns (max err 0.19)."""
    import sageattention_tpu as sa

    b, h, sq, sk, d = 1, 2, 256, 130, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, sk, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, sk, d), jnp.bfloat16)
    o = sa.sageattn(q, k, v, is_causal=True)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * d**-0.5
    # this kernel's cross-length causal convention is TOP-LEFT
    # aligned: q row i sees kv j iff j <= i (rows past sk see all keys)
    ii = jnp.arange(sq)[:, None]
    jj = jnp.arange(sk)[None, :]
    m = jj <= ii
    ref = jnp.einsum(
        "bhqk,bhkd->bhqd",
        jax.nn.softmax(jnp.where(m[None, None], sc, -1e30), -1),
        v.astype(jnp.float32))
    live = np.asarray(m.any(-1))  # rows with no visible kv are undefined
    a = np.asarray(o, np.float64)[:, :, live, :]
    r = np.asarray(ref, np.float64)[:, :, live, :]
    assert _cos(a, r) > 0.999
    assert float(np.max(np.abs(a - r))) < 0.06


def test_vt_heuristic_configs_valid_at_odd_lengths():
    """r4 regression: sk_p//2 could yield a non-128-multiple block_q
    (e.g. 320 at s=600) that no sub-tile divides."""
    from sageattention_tpu.ops.attention_pallas import (
        default_config, default_diag_chunk,
    )

    for s in (600, 640, 900, 1152, 1800, 2500, 5000, 17776):
        for causal in (False, True):
            bq, bk, sub, ck = default_config(s, s, 64, causal, vt=True)
            assert bq % 128 == 0 and bq % sub == 0, (s, causal, bq, sub)
            assert bk % ck == 0 or bk >= -(-s // 128) * 128
            dck = default_diag_chunk(s, s, 64, causal, vt=True)
            if dck is not None:
                assert ck % dck == 0, (s, causal, ck, dck)


def test_sageattn_cross_length_sq_gt_sk_interpret():
    """Public-API ragged cross-length (sq > sk) non-causal at hd64."""
    import sageattention_tpu as sa

    b, h, sq, sk, d = 1, 2, 600, 200, 64
    q = jax.random.normal(jax.random.PRNGKey(6), (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(7), (b, h, sk, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(8), (b, h, sk, d), jnp.bfloat16)
    o = sa.sageattn(q, k, v)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * d**-0.5
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1),
                     v.astype(jnp.float32))
    assert _cos(o, ref) > 0.999


def test_vt_native_multistep_noncausal_and_vt_o():
    """vt_native (normal-layout Q/V, MXU-side transposes) and
    vt_o_normal (in-kernel epilogue O transpose) on a MULTI-KV-STEP
    non-causal grid — production only reaches this at 32k, so pin it
    here with small blocks."""
    b, h, s, d = 1, 2, 512, 64
    q = jax.random.normal(jax.random.PRNGKey(10), (b, h, s, d),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(11), (b, h, s, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(12), (b, h, s, d),
                          jnp.bfloat16)
    k_i8, ks = quant.quant_int8_block_scales(k, group=128)
    kw = dict(
        k_i8=k_i8, k_scale=ks, v_q=v, q_scale=None,
        q_fold=d**-0.5 * LOG2E, is_causal=False, pv_dtype="bf16",
        block_q=256, block_k=256, sub_q=128, chunk_k=128,
        interpret=True,
    )
    o_native = sage_attention_fused(
        q_i8=q, vt=True, vt_native=True, **kw)
    o_nat_o, lse_o = sage_attention_fused(
        q_i8=q, vt=True, vt_native=True, vt_o_normal=True,
        return_lse=True, **kw)
    o_legacy = sage_attention_fused(
        q_i8=jnp.swapaxes(q, 2, 3), vt=True,
        **{**kw, "v_q": jnp.swapaxes(v, 2, 3)})
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * d**-0.5
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1),
                     v.astype(jnp.float32))
    for o in (o_native, o_nat_o, o_legacy):
        assert _cos(o, ref) > 0.999
    # identical quantization in all three modes -> tight agreement
    np.testing.assert_allclose(
        np.asarray(o_native, np.float32),
        np.asarray(o_legacy, np.float32), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(o_nat_o, np.float32),
        np.asarray(o_native, np.float32), atol=2e-2)
