"""Distribution layer tests on the 8-device virtual CPU mesh.

The reference has no in-repo distributed tests (SURVEY.md §4: "Distributed
testing: none below xDiT") — these cover what xDiT provided externally:
ring (context parallel), Ulysses (head all-to-all), and the composed
DP x ring x Ulysses matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu.ops import reference
from sageattention_tpu.parallel import (
    make_mesh,
    make_parallel_sageattn,
    make_ring_attention,
    make_ulysses_attention,
)
import sageattention_tpu as sa


def rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape).astype(dtype)


def cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))


B, H, S, D = 2, 4, 512, 64


@pytest.fixture(scope="module")
def qkv():
    return tuple(rand(i, (B, H, S, D)) for i in range(3))


class TestRing:
    @pytest.mark.parametrize("causal", [False, True])
    def test_ring_matches_reference(self, qkv, causal):
        q, k, v = qkv
        mesh = make_mesh(data=1, seq=8, heads=1)
        fn = make_ring_attention(
            mesh, "seq", is_causal=causal, data_axis=None, pv_dtype="bf16"
        )
        o = fn(q, k, v)
        o_ref = reference.attention_reference(q, k, v, is_causal=causal)
        assert cosine(o, o_ref) > 0.999

    def test_ring_equals_single_device_quality(self, qkv):
        """Ring output must be as accurate as the single-device op (the
        per-shard K smoothing must not degrade it)."""
        q, k, v = qkv
        k = k + 2.0  # K mean matters
        mesh = make_mesh(data=1, seq=4, heads=1, devices=jax.devices()[:4])
        fn = make_ring_attention(mesh, "seq", data_axis=None, pv_dtype="bf16")
        o_ring = fn(q, k, v)
        o_ref = reference.attention_reference(q, k, v)
        o_single = sa.sageattn(q, k, v, pv_dtype="bf16")
        c_ring = cosine(o_ring, o_ref)
        c_single = cosine(o_single, o_ref)
        assert c_ring > 0.999
        assert c_ring >= c_single - 1e-4


class TestUlysses:
    @pytest.mark.parametrize("causal", [False, True])
    def test_ulysses_matches_reference(self, qkv, causal):
        q, k, v = qkv
        mesh = make_mesh(data=1, seq=1, heads=4, devices=jax.devices()[:4])
        fn = make_ulysses_attention(
            mesh, "heads", is_causal=causal, data_axis=None, pv_dtype="bf16"
        )
        o = fn(q, k, v)
        o_ref = reference.attention_reference(q, k, v, is_causal=causal)
        assert cosine(o, o_ref) > 0.999

    def test_ulysses_equals_single_device_exactly(self, qkv):
        """Ulysses is pure data movement around the same single-device op:
        outputs must match the unsharded call to fp32 tolerance."""
        q, k, v = qkv
        mesh = make_mesh(data=1, seq=1, heads=4, devices=jax.devices()[:4])
        fn = make_ulysses_attention(mesh, "heads", data_axis=None, pv_dtype="bf16")
        o = fn(q, k, v)
        o_single = sa.sageattn(q, k, v, pv_dtype="bf16")
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(o_single, np.float32),
            atol=2e-2,
        )

    def test_ulysses_head_divisibility_error(self, qkv):
        q, k, v = qkv
        mesh = make_mesh(data=1, seq=1, heads=8)
        fn = make_ulysses_attention(mesh, "heads", data_axis=None)
        with pytest.raises(Exception):
            jax.block_until_ready(fn(q, k, v))  # 4 heads not divisible by 8


class TestComposed:
    def test_dp_ring_ulysses(self, qkv):
        """The full xDiT-style matrix: cfg/data x ring x ulysses = 2x2x2."""
        q, k, v = qkv
        mesh = make_mesh(data=2, seq=2, heads=2)
        fn = make_parallel_sageattn(mesh, pv_dtype="bf16")
        o = fn(q, k, v)
        o_ref = reference.attention_reference(q, k, v)
        assert o.shape == q.shape
        assert cosine(o, o_ref) > 0.999

    def test_dp_ring_ulysses_causal(self, qkv):
        q, k, v = qkv
        mesh = make_mesh(data=2, seq=2, heads=2)
        fn = make_parallel_sageattn(mesh, is_causal=True, pv_dtype="bf16")
        o = fn(q, k, v)
        o_ref = reference.attention_reference(q, k, v, is_causal=True)
        assert cosine(o, o_ref) > 0.999

    def test_ring_only_mesh(self, qkv):
        q, k, v = qkv
        mesh = make_mesh(data=1, seq=8, heads=1)
        fn = make_parallel_sageattn(mesh, data_axis=None, pv_dtype="bf16")
        o = fn(q, k, v)
        o_ref = reference.attention_reference(q, k, v)
        assert cosine(o, o_ref) > 0.999


class TestPositions:
    def test_position_masking_equals_causal(self, qkv):
        """Explicit positions == static causal on aligned inputs (the
        kernel path ring attention uses)."""
        q, k, v = qkv
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        o_pos = sa.sageattn(
            q, k, v, q_positions=pos, kv_positions=pos, pv_dtype="bf16"
        )
        o_causal = sa.sageattn(q, k, v, is_causal=True, pv_dtype="bf16")
        np.testing.assert_allclose(
            np.asarray(o_pos, np.float32),
            np.asarray(o_causal, np.float32),
            atol=2e-2,
        )


class TestParallelGradients:
    """The ring/composed paths are differentiable end-to-end: per-step
    fused backwards, KV-shard gradients rotating home through ppermute's
    transpose (round 1 substituted a score-materializing global VJP)."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_ring_grad_matches_global_exact(self, qkv, causal):
        q, k, v = qkv
        mesh = make_mesh(data=1, seq=4, heads=1, devices=jax.devices()[:4])
        fn = make_ring_attention(
            mesh, "seq", is_causal=causal, data_axis=None, pv_dtype="bf16"
        )

        def loss(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(
                reference.attention_reference(q, k, v, is_causal=causal) ** 2
            )

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(g, g_ref):
            assert cosine(a, r) > 0.99

    def test_composed_parallel_grad(self, qkv):
        q, k, v = qkv
        mesh = make_mesh(data=2, seq=2, heads=2)
        fn = make_parallel_sageattn(mesh, pv_dtype="bf16")

        def loss(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        def loss_ref(q, k, v):
            return jnp.sum(
                reference.attention_reference(q, k, v) ** 2
            )

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(g, g_ref):
            assert cosine(a, r) > 0.99
