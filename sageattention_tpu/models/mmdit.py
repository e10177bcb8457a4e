"""Dual-stream and cross-attention DiT variants.

The reference accelerates several distinct video-DiT architectures
(reference: example/):

* **Dual-stream MMDiT** (HunyuanVideo's dual-stream phase, Mochi-1's
  AsymmDiT): text and video tokens keep separate projection/MLP weights;
  attention is *joint* over the concatenated sequence (one softmax over
  [text; video]) — so a single fused sage-attention call still serves it
  (reference: example/mochi.py:11-50 installs the processor on exactly
  that joint attention).
* **Cross-attention DiT** (Wan2.1: self-attention over video tokens plus
  a separate cross-attention reading text; reference:
  example/modify_model/modify_wan.py:9-40 patches both call sites).
  Cross-attention has sq != sk — exercising the kernel's rectangular
  path.

Both route every attention through ``models.attention.attention`` so the
global backend switch and per-layer processors apply.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sageattention_tpu.models.attention import (
    SageAttnProcessor,
    attention as _attention,
)
from sageattention_tpu.models.configs import DiTConfig
from sageattention_tpu.models.dit import (
    TimestepEmbed,
    embed_video_text,
    finalize_video,
)


def _split_heads(x, heads, head_dim):
    b, s, _ = x.shape
    return jnp.swapaxes(x.reshape(b, s, heads, head_dim), 1, 2)


def _merge_heads(x):
    b, h, s, d = x.shape
    return jnp.swapaxes(x, 1, 2).reshape(b, s, h * d)


class DualStreamBlock(nn.Module):
    """One MMDiT block: separate text/video qkv+mlp weights, joint softmax
    (HunyuanVideo dual-stream / Mochi AsymmDiT structure)."""

    cfg: DiTConfig
    processor: SageAttnProcessor | None = None

    @nn.compact
    def __call__(self, xt, xv, cond):
        c = self.cfg
        inner = c.heads * c.head_dim

        mods = nn.Dense(12 * c.hidden, dtype=jnp.float32, name="adaln")(
            nn.silu(cond)
        )[:, None, :]
        (tsh1, tsc1, tg1, tsh2, tsc2, tg2,
         vsh1, vsc1, vg1, vsh2, vsc2, vg2) = jnp.split(mods, 12, axis=-1)

        def norm(x):
            return nn.LayerNorm(
                use_bias=False, use_scale=False, dtype=jnp.float32
            )(x)

        ht = (norm(xt) * (1 + tsc1) + tsh1).astype(xt.dtype)
        hv = (norm(xv) * (1 + vsc1) + vsh1).astype(xv.dtype)

        # separate projections per stream (the "dual-stream" part)
        qkv_t = nn.Dense(3 * inner, dtype=xt.dtype, name="qkv_text")(ht)
        qkv_v = nn.Dense(3 * inner, dtype=xv.dtype, name="qkv_video")(hv)
        qt, kt, vt = jnp.split(qkv_t, 3, axis=-1)
        qv, kv, vv = jnp.split(qkv_v, 3, axis=-1)

        def heads(x):
            return _split_heads(x, c.heads, c.head_dim)

        q = jnp.concatenate([heads(qt), heads(qv)], axis=2)
        k = jnp.concatenate([heads(kt), heads(kv)], axis=2)
        v = jnp.concatenate([heads(vt), heads(vv)], axis=2)
        q = nn.RMSNorm(dtype=q.dtype, name="q_norm")(q)
        k = nn.RMSNorm(dtype=k.dtype, name="k_norm")(k)

        # ONE joint softmax over [text; video] — the call the reference's
        # processor intercepts (example/mochi.py:24-47)
        if self.processor is not None:
            o = self.processor(q, k, v)
        else:
            o = _attention(q, k, v, is_causal=False)
        o = _merge_heads(o)
        st = xt.shape[1]
        ot, ov = o[:, :st], o[:, st:]
        xt = xt + tg1.astype(xt.dtype) * nn.Dense(
            c.hidden, dtype=xt.dtype, name="out_text"
        )(ot)
        xv = xv + vg1.astype(xv.dtype) * nn.Dense(
            c.hidden, dtype=xv.dtype, name="out_video"
        )(ov)

        # separate MLPs per stream
        def mlp(x, name):
            h = nn.Dense(
                int(c.hidden * c.mlp_ratio), dtype=x.dtype, name=f"{name}_up"
            )(x)
            return nn.Dense(
                c.hidden, dtype=x.dtype, name=f"{name}_down"
            )(nn.gelu(h))

        ht = (norm(xt) * (1 + tsc2) + tsh2).astype(xt.dtype)
        hv = (norm(xv) * (1 + vsc2) + vsh2).astype(xv.dtype)
        xt = xt + tg2.astype(xt.dtype) * mlp(ht, "mlp_text")
        xv = xv + vg2.astype(xv.dtype) * mlp(hv, "mlp_video")
        return xt, xv


class DualStreamVideoDiT(nn.Module):
    """HunyuanVideo/Mochi-shaped dual-stream video DiT."""

    cfg: DiTConfig
    latent_channels: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    processor: SageAttnProcessor | None = None

    @nn.compact
    def __call__(self, latents, text_emb, t):
        c = self.cfg
        xt, xv = embed_video_text(self, c, self.dtype, latents, text_emb)
        cond = TimestepEmbed(c.hidden, name="t_embed")(t)
        for i in range(c.depth):
            xt, xv = DualStreamBlock(
                c, self.processor, name=f"block_{i}"
            )(xt, xv, cond)
        return finalize_video(xv, latents.shape, c.patch, c.patch_t)


class CrossAttnBlock(nn.Module):
    """Wan-style block: video self-attention + text cross-attention + MLP
    (reference: modify_wan.py patches WanAttnProcessor2_0 on both)."""

    cfg: DiTConfig
    processor: SageAttnProcessor | None = None

    @nn.compact
    def __call__(self, xv, text, cond):
        c = self.cfg
        inner = c.heads * c.head_dim

        mods = nn.Dense(6 * c.hidden, dtype=jnp.float32, name="adaln")(
            nn.silu(cond)
        )[:, None, :]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mods, 6, axis=-1)

        def norm(x):
            return nn.LayerNorm(
                use_bias=False, use_scale=False, dtype=jnp.float32
            )(x)

        def attend(q, k, v):
            if self.processor is not None:
                return self.processor(q, k, v)
            return _attention(q, k, v, is_causal=False)

        # self-attention over video tokens
        h = (norm(xv) * (1 + sc1) + sh1).astype(xv.dtype)
        qkv = nn.Dense(3 * inner, dtype=xv.dtype, name="self_qkv")(h)
        q, k, v = (
            _split_heads(x, c.heads, c.head_dim)
            for x in jnp.split(qkv, 3, axis=-1)
        )
        q = nn.RMSNorm(dtype=q.dtype, name="q_norm")(q)
        k = nn.RMSNorm(dtype=k.dtype, name="k_norm")(k)
        o = _merge_heads(attend(q, k, v))
        xv = xv + g1.astype(xv.dtype) * nn.Dense(
            c.hidden, dtype=xv.dtype, name="self_out"
        )(o)

        # cross-attention: video queries, text keys/values (sq != sk)
        h = norm(xv).astype(xv.dtype)
        qc = _split_heads(
            nn.Dense(inner, dtype=xv.dtype, name="cross_q")(h),
            c.heads, c.head_dim,
        )
        kc = _split_heads(
            nn.Dense(inner, dtype=xv.dtype, name="cross_k")(text),
            c.heads, c.head_dim,
        )
        vc = _split_heads(
            nn.Dense(inner, dtype=xv.dtype, name="cross_v")(text),
            c.heads, c.head_dim,
        )
        # qk-norm on cross-attention too (Wan2.1 applies norm_q/norm_k
        # here as well) — tames INT8 ranges on outlier text channels
        qc = nn.RMSNorm(dtype=qc.dtype, name="cross_q_norm")(qc)
        kc = nn.RMSNorm(dtype=kc.dtype, name="cross_k_norm")(kc)
        o = _merge_heads(attend(qc, kc, vc))
        xv = xv + nn.Dense(c.hidden, dtype=xv.dtype, name="cross_out")(o)

        h = (norm(xv) * (1 + sc2) + sh2).astype(xv.dtype)
        up = nn.Dense(int(c.hidden * c.mlp_ratio), dtype=xv.dtype,
                      name="mlp_up")(h)
        xv = xv + g2.astype(xv.dtype) * nn.Dense(
            c.hidden, dtype=xv.dtype, name="mlp_down"
        )(nn.gelu(up))
        return xv


class CrossAttnVideoDiT(nn.Module):
    """Wan2.1-shaped video DiT (self-attn over video + text cross-attn)."""

    cfg: DiTConfig
    latent_channels: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    processor: SageAttnProcessor | None = None

    @nn.compact
    def __call__(self, latents, text_emb, t):
        c = self.cfg
        text, xv = embed_video_text(self, c, self.dtype, latents, text_emb)
        cond = TimestepEmbed(c.hidden, name="t_embed")(t)
        for i in range(c.depth):
            xv = CrossAttnBlock(c, self.processor, name=f"block_{i}")(
                xv, text, cond
            )
        return finalize_video(xv, latents.shape, c.patch, c.patch_t)
