"""Decoder-only LLM (prefill path) — SageAttention's second headline use
case (causal attention, reference bench sweep: bench_qk_int8_pv_fp8_cuda.py
is_causal=True shapes).

Llama-style: RMSNorm, RoPE, GQA, SwiGLU, causal sage attention via the
pluggable backend.  This is the *prefill* compute path (full-sequence
causal attention); decode-time KV caching is out of scope of the
reference (its kernels are prefill/training-shape only).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sageattention_tpu.models.attention import (
    attention as _attention,
)
from sageattention_tpu.models.configs import LLMConfig


def rope(x, positions, base=10000.0):
    """x: [b, h, s, d]; rotate pairs (d/2)."""
    d = x.shape[-1]
    half = d // 2
    freqs = base ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[:, None, :, None] * freqs  # [b,1,s,half]
    sin, cos = jnp.sin(ang), jnp.cos(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [
            (x1 * cos - x2 * sin).astype(x.dtype),
            (x2 * cos + x1 * sin).astype(x.dtype),
        ],
        axis=-1,
    )


class LLMBlock(nn.Module):
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, positions):
        c = self.cfg
        b, s, _ = x.shape
        h = nn.RMSNorm(dtype=jnp.float32, name="attn_norm")(x).astype(
            self.dtype
        )
        q = nn.Dense(c.heads * c.head_dim, use_bias=False, dtype=self.dtype)(h)
        k = nn.Dense(c.kv_heads * c.head_dim, use_bias=False, dtype=self.dtype)(h)
        v = nn.Dense(c.kv_heads * c.head_dim, use_bias=False, dtype=self.dtype)(h)

        def to_hnd(t, nh):
            return jnp.swapaxes(t.reshape(b, s, nh, c.head_dim), 1, 2)

        q = rope(to_hnd(q, c.heads), positions)
        k = rope(to_hnd(k, c.kv_heads), positions)
        v = to_hnd(v, c.kv_heads)
        o = _attention(q, k, v, is_causal=True)
        o = jnp.swapaxes(o, 1, 2).reshape(b, s, c.heads * c.head_dim)
        x = x + nn.Dense(c.hidden, use_bias=False, dtype=self.dtype, name="o_proj")(o)

        h = nn.RMSNorm(dtype=jnp.float32, name="mlp_norm")(x).astype(self.dtype)
        mh = c.mlp_hidden or 4 * c.hidden
        gate = nn.Dense(mh, use_bias=False, dtype=self.dtype, name="gate")(h)
        up = nn.Dense(mh, use_bias=False, dtype=self.dtype, name="up")(h)
        down = nn.Dense(
            c.hidden, use_bias=False, dtype=self.dtype, name="down"
        )(nn.silu(gate) * up)
        return x + down


class CausalLM(nn.Module):
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        b, s = tokens.shape
        x = nn.Embed(c.vocab, c.hidden, dtype=self.dtype, name="embed")(tokens)
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        for i in range(c.depth):
            x = LLMBlock(c, self.dtype, name=f"layer_{i}")(x, positions)
        x = nn.RMSNorm(dtype=jnp.float32, name="final_norm")(x)
        return nn.Dense(
            c.vocab, use_bias=False, dtype=jnp.float32, name="lm_head"
        )(x)
