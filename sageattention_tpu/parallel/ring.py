"""Ring (context-parallel) attention over a mesh axis.

The reference exposes only the hook for this — per-row logsumexp output so
an *external* ring loop (xDiT) can merge partial attentions (reference:
core.py:122-124, example/run_parallel.sh:37-41).  Here the ring itself is a
first-class, in-repo capability: KV shards rotate around the mesh axis via
``jax.lax.ppermute`` (point-to-point over ICI) while each device attends
its local Q against the block in hand, merging partials with the online
LSE rule.  The ``ppermute`` for step t+1 is issued before step t's compute
so XLA can overlap the ICI transfer with the attention kernel.

Causal masking across rotated blocks uses the kernel's explicit
position-id masking (offsets are dynamic per device; the static causal
early-exit only applies to aligned Q/KV).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sageattention_tpu import core


def _merge(o_acc, lse_acc, o_i, lse_i):
    """Streaming LSE merge of attention partials (natural log)."""
    m = jnp.maximum(lse_acc, lse_i)
    # fully-masked partials carry lse == -inf; exp(-inf - -inf) -> use where
    w_acc = jnp.where(jnp.isneginf(lse_acc), 0.0, jnp.exp(lse_acc - m))
    w_i = jnp.where(jnp.isneginf(lse_i), 0.0, jnp.exp(lse_i - m))
    denom = w_acc + w_i
    safe = jnp.where(denom == 0.0, 1.0, denom)
    o = (o_acc * w_acc[..., None] + o_i * w_i[..., None]) / safe[..., None]
    lse = m + jnp.log(jnp.maximum(denom, 1e-45))
    lse = jnp.where(denom == 0.0, -jnp.inf, lse)
    return o, lse


def ring_sageattn(
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
    """Ring attention body — call INSIDE ``shard_map``.

    q, k, v: local HND shards [b, h, s_local, d]; the global sequence is
    the concatenation over ``axis_name`` in axis-index order.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, hq, s_loc, d_og = q.shape
    if sm_scale is None:
        sm_scale = d_og**-0.5
    perm = [(i, (i + 1) % n) for i in range(n)]

    local_pos = jnp.arange(s_loc, dtype=jnp.int32)
    q_pos = jnp.broadcast_to(idx * s_loc + local_pos, (b, s_loc))

    o_acc = jnp.zeros((b, hq, s_loc, d_og), jnp.float32)
    lse_acc = jnp.full((b, hq, s_loc), -jnp.inf, jnp.float32)

    kb, vb = k, v
    for step in range(n):
        if step < n - 1:
            # issue the rotation before computing: XLA overlaps the ICI
            # transfer with the attention kernel below.
            kb_next = jax.lax.ppermute(kb, axis_name, perm)
            vb_next = jax.lax.ppermute(vb, axis_name, perm)
        src = (idx - step) % n  # whose KV shard we hold this step
        if is_causal:
            kv_pos = jnp.broadcast_to(src * s_loc + local_pos, (b, s_loc))
            o_i, lse_i = core._entry(
                q,
                kb,
                vb,
                "HND",
                False,
                sm_scale,
                True,
                q_positions=q_pos,
                kv_positions=kv_pos,
                **attn_kwargs,
            )
        else:
            o_i, lse_i = core._entry(
                q, kb, vb, "HND", False, sm_scale, True, **attn_kwargs
            )
        o_acc, lse_acc = _merge(
            o_acc, lse_acc, o_i.astype(jnp.float32), lse_i
        )
        if step < n - 1:
            kb, vb = kb_next, vb_next

    o = o_acc.astype(q.dtype)
    if return_lse:
        return o, lse_acc
    return o


def make_ring_attention(
    mesh,
    axis_name: str = "seq",
    *,
    is_causal: bool = False,
    data_axis: str | None = "data",
    **attn_kwargs,
):
    """shard_map-wrapped ring attention: global [b, h, S, d] -> [b, h, S, d]
    with the sequence sharded over ``axis_name`` and batch over
    ``data_axis``."""
    from jax.sharding import PartitionSpec as P

    spec = P(data_axis, None, axis_name, None)

    def fn(q, k, v):
        return ring_sageattn(
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


def allgather_sageattn(
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
    """All-gather-KV context parallelism — call INSIDE ``shard_map``.

    Simpler than the ring (one fused all-gather, no per-step merge); best
    when KV fits replicated and the sequence shard per device is small.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, hq, s_loc, d_og = q.shape
    if sm_scale is None:
        sm_scale = d_og**-0.5
    k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
    kwargs = dict(attn_kwargs)
    if is_causal:
        local_pos = jnp.arange(s_loc, dtype=jnp.int32)
        kwargs["q_positions"] = jnp.broadcast_to(
            idx * s_loc + local_pos, (b, s_loc)
        )
        kwargs["kv_positions"] = jnp.broadcast_to(
            jnp.arange(n * s_loc, dtype=jnp.int32), (b, n * s_loc)
        )
    return core._entry(
        q, k_full, v_full, "HND", False, sm_scale, return_lse, **kwargs
    )
