"""Boundary certification for the lazy-softmax reference max.

The fused kernel's default path replaces the per-chunk row-max pass with
a per-sub-tile reference max taken from the sub-tile's first unmasked
chunk (``attention_pallas._compute_parts``, ``lazy``).  exp2 against a
trailing reference is exact as long as the within-block base-2 logit
spread stays under ~120 (p may reach 2^119 before the bf16 cast for the
PV dot; f32 carries it).  These tests drive PLANTED logit spreads to
that documented boundary — later-chunk max far above the first chunk's —
and cross-check the lazy path against (a) the exact-dequant oracle and
(b) the kernel's own exact-max branch (forced via an all-ones mask,
which routes every work item to the exact per-chunk max).

Reference verification bar: the 0.002 rel-err dump-diff protocol
(reference: utils/count.py:8-10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu import quant
from sageattention_tpu.ops import reference
from sageattention_tpu.ops.attention_pallas import sage_attention_fused

LOG2E = 1.4426950408889634


def _planted_inputs(s, d, spread_base2, *, rising=True, b=1, h=1):
    """q/k whose logits step from ~0 (first chunk) to ~spread_base2
    (base-2 units) in later chunks; v is well-conditioned random."""
    # q rows: unit vectors along channel 0 -> logit(i, j) = k_j[0]
    q = jnp.zeros((b, h, s, d), jnp.float32).at[:, :, :, 0].set(1.0)
    # k channel 0 STEPS between halves (first half ~0, second half the
    # full spread), so the lazy m_ref taken from the first chunk trails
    # the later chunks' max by the whole `spread_base2`; a small ramp
    # within each half keeps the softmax non-degenerate.  hi is the
    # natural-log magnitude that yields `spread_base2` base-2 units
    # under sm_scale = 1 and the folded log2(e).
    hi = spread_base2 / LOG2E
    pos = jnp.arange(s)
    step = jnp.where(pos < s // 2, 0.0, hi)
    if not rising:
        step = hi - step
    ramp = step + jnp.linspace(0.0, 2.0, s)
    k = jnp.zeros((b, h, s, d), jnp.float32).at[:, :, :, 0].set(ramp)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)
    return q, k, v


def _quantize(q, k, v, chunk_k):
    d = q.shape[-1]
    q_i8, qs = quant.quant_int8(
        q.astype(jnp.bfloat16), granularity="per_token",
        scale_fold=1.0 * LOG2E,  # sm_scale = 1 (planted logits are raw)
    )
    k_i8, ks = quant.quant_int8_block_scales(
        k.astype(jnp.bfloat16), group=chunk_k
    )
    v_q, vs, _ = quant.per_channel_quant(v.astype(jnp.bfloat16),
                                         dtype=jnp.int8)
    return q_i8, qs, k_i8, ks, v_q, vs


def _oracle(q_i8, qs, k_i8, ks, v_q, vs, chunk_k):
    """Exact dequant math on the SAME quantized tensors."""
    sk = k_i8.shape[2]
    ks_row = jnp.repeat(ks, chunk_k, axis=-1)[..., :sk]
    return reference.quantized_attention_reference(
        q_i8, qs, k_i8, ks_row, v_q, vs, None, is_causal=False,
        out_dtype=jnp.float32,
    )


@pytest.mark.parametrize("spread", [30.0, 80.0, 110.0])
@pytest.mark.parametrize("rising", [True, False])
def test_planted_spread_single_block(spread, rising):
    """Within one KV block, later chunks' max exceeds (or trails) the
    first chunk's m_ref by up to 110 base-2 units: lazy exp2 carries
    p up to 2^110 and the merge must still normalize exactly."""
    s, d, chunk = 256, 64, 128
    q, k, v = _planted_inputs(s, d, spread, rising=rising)
    q_i8, qs, k_i8, ks, v_q, vs = _quantize(q, k, v, chunk)
    o = sage_attention_fused(
        q_i8, qs, k_i8, ks, v_q, vs,
        block_q=128, block_k=256, sub_q=128, chunk_k=chunk,
        out_dtype=jnp.float32, interpret=True,
    )
    o = np.asarray(o)
    assert np.isfinite(o).all(), "lazy softmax overflowed to inf/NaN"
    ref = np.asarray(_oracle(q_i8, qs, k_i8, ks, v_q, vs, chunk))
    # the softmax is one-hot-ish on the top ramp entries; exact dequant
    # oracle on identical quantized inputs must agree to fp32 tolerance
    np.testing.assert_allclose(o, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("spread", [80.0, 110.0])
def test_planted_spread_multi_step(spread):
    """The spread straddles KV *blocks* (online-softmax scratch carry):
    block 2's chunk max joins a far-lower running m from block 1."""
    s, d, blk, chunk = 512, 64, 128, 128
    q, k, v = _planted_inputs(s, d, spread)
    q_i8, qs, k_i8, ks, v_q, vs = _quantize(q, k, v, chunk)
    o = sage_attention_fused(
        q_i8, qs, k_i8, ks, v_q, vs,
        block_q=128, block_k=blk, sub_q=128, chunk_k=chunk,
        out_dtype=jnp.float32, interpret=True,
    )
    o = np.asarray(o)
    assert np.isfinite(o).all()
    ref = np.asarray(_oracle(q_i8, qs, k_i8, ks, v_q, vs, chunk))
    np.testing.assert_allclose(o, ref, rtol=2e-3, atol=2e-3)


def test_lazy_matches_exact_branch():
    """An all-ones attn_mask routes every work item to the exact
    per-chunk-max branch (masked items are never lazy); the two branches
    must agree to fp rounding on the same planted-spread inputs."""
    s, d, chunk = 256, 64, 128
    b = h = 1
    q, k, v = _planted_inputs(s, d, 100.0)
    q_i8, qs, k_i8, ks, v_q, vs = _quantize(q, k, v, chunk)
    kw = dict(block_q=128, block_k=256, sub_q=128, chunk_k=chunk,
              out_dtype=jnp.float32, interpret=True)
    o_lazy = sage_attention_fused(q_i8, qs, k_i8, ks, v_q, vs, **kw)
    ones = jnp.ones((b, 1, s, s), jnp.int8)
    o_exact = sage_attention_fused(
        q_i8, qs, k_i8, ks, v_q, vs, attn_mask_i8=ones, **kw
    )
    np.testing.assert_allclose(
        np.asarray(o_lazy), np.asarray(o_exact), rtol=1e-3, atol=1e-3
    )


def test_masked_item_with_spurious_large_masked_logit():
    """The ADVICE.md r3 scenario: masked columns carry logits FAR above
    any live column.  Masked work items take the exact-max branch, so
    the live rows' p must not underflow to zero (the failure mode of a
    mask-blind lazy m_ref)."""
    s, d, chunk = 256, 64, 128
    q, k, v = _planted_inputs(s, d, 100.0)  # huge logits in chunk 2
    q_i8, qs, k_i8, ks, v_q, vs = _quantize(q, k, v, chunk)
    # mask OFF the entire high-logit second half
    mask = jnp.ones((1, 1, s, s), jnp.int8).at[:, :, :, s // 2:].set(0)
    o = sage_attention_fused(
        q_i8, qs, k_i8, ks, v_q, vs, attn_mask_i8=mask,
        block_q=128, block_k=256, sub_q=128, chunk_k=chunk,
        out_dtype=jnp.float32, interpret=True,
    )
    o = np.asarray(o)
    assert np.isfinite(o).all()
    # oracle over the VISIBLE half only
    ref = np.asarray(_oracle(
        q_i8, qs, k_i8[:, :, :s // 2], ks[..., :1], v_q[:, :, :s // 2],
        vs, chunk,
    ))
    np.testing.assert_allclose(o, ref, rtol=2e-3, atol=2e-3)
    assert np.abs(o).max() > 1e-3, "live rows were silently zeroed"
