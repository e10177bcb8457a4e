"""Ulysses sequence parallelism (head all-to-all) over a mesh axis.

The reference reaches this through xDiT's --ulysses_degree (reference:
example/parallel_sageattn_cogvideo.py:32-36): activations arrive
sequence-sharded; an all-to-all swaps the shard dimension from sequence to
heads so every device runs *full-sequence* attention on a head subset,
then a second all-to-all swaps back.  On TPU this is one
``jax.lax.all_to_all`` pair over ICI.

Because each device sees the full sequence, the static causal early-exit
and all single-device kernel features apply unchanged — this is the
preferred strategy when head count is divisible by the axis size.
"""

from __future__ import annotations

import jax

from sageattention_tpu import core


def ulysses_sageattn(
    q,
    k,
    v,
    axis_name: str,
    *,
    is_causal: bool = False,
    sm_scale: float | None = None,
    return_lse: bool = False,
    **attn_kwargs,
):
    """Ulysses attention body — call INSIDE ``shard_map``.

    q, k, v: local HND shards [b, h, s_local, d] (sequence-sharded over
    ``axis_name``).  h and h_kv must be divisible by the axis size.
    """
    n = jax.lax.axis_size(axis_name)
    hq, hkv = q.shape[1], k.shape[1]
    if hq % n or hkv % n:
        raise ValueError(
            f"Ulysses requires heads ({hq}) and kv heads ({hkv}) divisible "
            f"by axis size {n}; shard fewer ways or use ring attention"
        )
    if n == 1:
        out = core._entry(
            q, k, v, "HND", is_causal, sm_scale, return_lse, **attn_kwargs
        )
        return out

    def seq_to_head(x):
        # [b, h, s/n, d] -> [b, h/n, s, d]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    def head_to_seq(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    qg, kg, vg = seq_to_head(q), seq_to_head(k), seq_to_head(v)
    out = core._entry(
        qg, kg, vg, "HND", is_causal, sm_scale, return_lse, **attn_kwargs
    )
    if return_lse:
        o, lse = out
        # lse is [b, h/n, S]; bring back to [b, h, s/n]
        lse_back = jax.lax.all_to_all(
            lse, axis_name, split_axis=2, concat_axis=1, tiled=True
        )
        return head_to_seq(o), lse_back
    return head_to_seq(out)


def make_ulysses_attention(
    mesh,
    axis_name: str = "heads",
    *,
    is_causal: bool = False,
    data_axis: str | None = "data",
    **attn_kwargs,
):
    from jax.sharding import PartitionSpec as P

    spec = P(data_axis, None, axis_name, None)

    def fn(q, k, v):
        return ulysses_sageattn(
            q, k, v, axis_name, is_causal=is_causal, **attn_kwargs
        )

    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    )
