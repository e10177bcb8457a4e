"""Speculative decoding: draft-token verification (serving utility).

The attention side of speculative decoding is already native here: the
decode kernel's ``t_q > 1`` causal tail scores a whole draft block
against the int8 cache in one pass, and a rejected tail ROLLS BACK for
free — per-token scales mean stale cache rows carry no state, so
``lengths = base + n_accepted`` simply lets the next append overwrite
them (tested in tests/test_decode.py::TestSpeculative).

This module adds the token-level acceptance rule (Leviathan et al.,
arXiv 2211.17192 — see PAPERS.md; referenced as public method, not
code): accept draft token i while u_i < min(1, p_target/p_draft), and
resample the first rejected position from the residual
norm(max(p - q, 0)), which makes the OUTPUT DISTRIBUTION exactly the
target model's — speculation changes latency, never samples.

Greedy serving (temperature 0) reduces to prefix-matching argmaxes;
pass ``draft_logits=None`` for that fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("greedy",))
def speculative_verify(
    draft_tokens: jax.Array,    # [b, k] int32 proposed tokens
    target_logits: jax.Array,   # [b, k+1, V] target model on the draft
    draft_logits: jax.Array | None = None,   # [b, k, V] (sampling mode)
    key: jax.Array | None = None,
    *,
    greedy: bool = True,
):
    """Verify a draft block against target logits.

    ``target_logits[:, i]`` is the target's distribution at draft
    position i (i.e. AFTER tokens < i), with one extra row ``[:, k]``
    for the bonus token when the whole draft is accepted — exactly the
    logits a ``t_q = k + 1`` chunked-decode step produces.

    Returns ``(n_accepted [b] int32, next_token [b] int32)``: the draft
    prefix to keep and the corrected/bonus token that follows it.  The
    caller advances ``lengths = base + n_accepted + 1`` after appending
    ``next_token`` (rolling back the rejected tail costs nothing).

    ``greedy=True`` accepts while the target argmax equals the draft
    token.  Otherwise pass ``draft_logits`` and ``key`` for the
    rejection-sampling rule (exact target distribution)."""
    b, k = draft_tokens.shape
    draft_tokens = draft_tokens.astype(jnp.int32)

    if greedy:
        tgt = jnp.argmax(target_logits[:, :k], axis=-1).astype(jnp.int32)
        ok = tgt == draft_tokens                        # [b, k]
        # first mismatch (k if none): argmin finds the first False
        n_acc = jnp.argmin(
            jnp.pad(ok, ((0, 0), (0, 1)), constant_values=False),
            axis=1,
        ).astype(jnp.int32)
        bonus = jnp.argmax(target_logits[:, k], axis=-1)
        all_tok = jnp.concatenate([tgt, bonus[:, None].astype(jnp.int32)],
                                  axis=1)               # [b, k+1]
        next_token = jnp.take_along_axis(
            all_tok, n_acc[:, None], axis=1
        )[:, 0]
        return n_acc, next_token

    assert draft_logits is not None and key is not None
    p = jax.nn.softmax(target_logits[:, :k].astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(draft_logits.astype(jnp.float32), axis=-1)
    p_tok = jnp.take_along_axis(p, draft_tokens[..., None], axis=-1)[..., 0]
    q_tok = jnp.take_along_axis(q, draft_tokens[..., None], axis=-1)[..., 0]
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (b, k))
    ok = u * q_tok < p_tok                  # u < p/q without the divide
    n_acc = jnp.argmin(
        jnp.pad(ok, ((0, 0), (0, 1)), constant_values=False), axis=1
    ).astype(jnp.int32)

    # residual distribution at the first rejected position: the bonus
    # row is appended so gathering at n_acc == k picks the plain target
    resid = jnp.maximum(p - q, 0.0)                       # [b, k, V]
    resid = resid / jnp.maximum(
        jnp.sum(resid, axis=-1, keepdims=True), 1e-20
    )
    bonus_p = jax.nn.softmax(
        target_logits[:, k:].astype(jnp.float32), axis=-1
    )                                                     # [b, 1, V]
    dist = jnp.concatenate([resid, bonus_p], axis=1)      # [b, k+1, V]
    at_n = jnp.take_along_axis(
        dist, n_acc[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]                                               # [b, V]
    next_token = jax.random.categorical(
        kr, jnp.log(jnp.maximum(at_n, 1e-20)), axis=-1
    ).astype(jnp.int32)
    return n_acc, next_token
