"""Video DiT in flax.linen — the model family the reference accelerates.

A CogVideoX-style joint text-video diffusion transformer (reference
integration: example/cogvideox-2b.py — the reference patches attention in
diffusers' CogVideoXTransformer3D; here the transformer is implemented
natively so every attention call goes through
``models.attention.attention`` and the backend switch applies).

Architecture (CogVideoX family): 3D patch embedding of video latents,
text tokens prepended, adaLN-zero conditioning from the timestep
embedding, joint self-attention over [text; video] tokens (non-causal),
GELU MLP, unpatchify head.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sageattention_tpu.models.attention import (
    SageAttnProcessor,
    attention as _attention,
)
from sageattention_tpu.models.configs import DiTConfig


def embed_video_text(mdl: nn.Module, cfg: DiTConfig, dtype,
                     latents, text_emb):
    """Shared DiT trunk entry: 3D patchify (pt*p*p*C voxels per token,
    pt = cfg.patch_t temporal patch — CogVideoX-1.5 style) +
    patch/positional embedding of video, linear embedding of text.
    Called inside a model's ``nn.compact`` __call__; params attach to
    the caller under the usual names (patch_embed/pos_embed/text_embed).
    Returns (xt, xv)."""
    b, F, H, W, C = latents.shape
    p, pt = cfg.patch, cfg.patch_t
    xv = latents.reshape(b, F // pt, pt, H // p, p, W // p, p, C)
    xv = jnp.transpose(xv, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
        b, (F // pt) * (H // p) * (W // p), pt * p * p * C
    )
    xv = nn.Dense(cfg.hidden, dtype=dtype, name="patch_embed")(xv)
    pos = mdl.param(
        "pos_embed",
        nn.initializers.normal(0.02),
        (1, cfg.video_tokens, cfg.hidden),
        jnp.float32,
    )
    xv = xv + pos[:, : xv.shape[1]].astype(dtype)
    xt = nn.Dense(cfg.hidden, dtype=dtype, name="text_embed")(
        text_emb.astype(dtype)
    )
    return xt, xv


def finalize_video(xv, video_shape, p: int, pt: int = 1):
    """Shared DiT trunk exit: final norm + unpatchify projection back to
    the latent video shape.  Per-token ops, so callers may slice video
    tokens out of a joint sequence before or after equivalently."""
    b, F, H, W, C = video_shape
    xv = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(xv)
    out = nn.Dense(pt * p * p * C, dtype=jnp.float32, name="unpatchify")(xv)
    out = out.reshape(b, F // pt, H // p, W // p, pt, p, p, C)
    return jnp.transpose(out, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
        b, F, H, W, C
    )


class TimestepEmbed(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 8
        freqs = jnp.exp(
            -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
        )
        ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        emb = nn.Dense(self.dim, dtype=jnp.float32)(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, dtype=jnp.float32)(emb)


class Attention(nn.Module):
    heads: int
    head_dim: int
    processor: SageAttnProcessor | None = None

    @nn.compact
    def __call__(self, x):
        b, s, _ = x.shape
        inner = self.heads * self.head_dim
        qkv = nn.Dense(3 * inner, dtype=x.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_hnd(t):
            return jnp.swapaxes(
                t.reshape(b, s, self.heads, self.head_dim), 1, 2
            )

        q, k, v = to_hnd(q), to_hnd(k), to_hnd(v)
        # qk-norm (CogVideoX / Wan use it; also tames INT8 ranges)
        q = nn.LayerNorm(dtype=q.dtype, name="q_norm")(q)
        k = nn.LayerNorm(dtype=k.dtype, name="k_norm")(k)
        if self.processor is not None:
            o = self.processor(q, k, v)
        else:
            o = _attention(q, k, v, is_causal=False)
        o = jnp.swapaxes(o, 1, 2).reshape(b, s, inner)
        return nn.Dense(x.shape[-1], dtype=x.dtype, name="out")(o)


class DiTBlock(nn.Module):
    cfg: DiTConfig
    processor: SageAttnProcessor | None = None

    @nn.compact
    def __call__(self, x, cond):
        c = self.cfg
        # adaLN-zero: 6 modulation vectors from the conditioning embedding
        mods = nn.Dense(6 * c.hidden, dtype=jnp.float32, name="adaln")(
            nn.silu(cond)
        )
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mods[:, None, :], 6, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32)(x)
        h = (h * (1 + sc1) + sh1).astype(x.dtype)
        x = x + g1.astype(x.dtype) * Attention(
            c.heads, c.head_dim, self.processor, name="attn"
        )(h)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32)(x)
        h = (h * (1 + sc2) + sh2).astype(x.dtype)
        mlp = nn.Sequential(
            [
                nn.Dense(int(c.hidden * c.mlp_ratio), dtype=x.dtype),
                nn.gelu,
                nn.Dense(c.hidden, dtype=x.dtype),
            ]
        )
        return x + g2.astype(x.dtype) * mlp(h)


class VideoDiT(nn.Module):
    """Joint text-video diffusion transformer.

    __call__(latents [b, F, H, W, C], text_emb [b, Lt, hidden], t [b])
      -> predicted noise [b, F, H, W, C]
    """

    cfg: DiTConfig
    latent_channels: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    processor: SageAttnProcessor | None = None

    @nn.compact
    def __call__(self, latents, text_emb, t):
        c = self.cfg
        xt, xv = embed_video_text(self, c, self.dtype, latents, text_emb)
        x = jnp.concatenate([xt, xv], axis=1)

        cond = TimestepEmbed(c.hidden, name="t_embed")(t)
        for i in range(c.depth):
            x = DiTBlock(c, self.processor, name=f"block_{i}")(x, cond)

        # finalize_video's norm is per-token: slicing before == after
        return finalize_video(x[:, xt.shape[1]:], latents.shape, c.patch,
                              c.patch_t)
