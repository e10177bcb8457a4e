"""Assert the FUSED Pallas backward kernels run inside the ring's VJP.

Round-2/3 verdicts: the >=85% 2-host scaling projection assumes the
ring-parallel training step differentiates through the fused backward
kernels (ops/attention_bwd_pallas), not a silent flash/XLA fallback.
This walks the traced jaxpr of the sharded training step's VJP on the
8-virtual-device mesh and asserts

  * the forward fused kernel (`_kernel` family) appears under shard_map,
  * BOTH backward kernels (`_dq_kernel`, `_dkv_kernel`) appear,
  * no jax flash-attention kernel is anywhere in the graph.

Reference hook this guards: the LSE ring contract
(reference: core.py:122-124) — the VJP must flow through the same fused
kernels whose LSE the ring merges.
"""

import jax
import jax.numpy as jnp

from sageattention_tpu.parallel import api as par_api
from sageattention_tpu.parallel import mesh as par_mesh


def _walk_eqns(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            # the kernel function's identity (name + source location)
            # lives on the inner jaxpr's debug info, e.g.
            # "_dq_kernel at .../ops/attention_bwd_pallas.py:47"
            inner = eqn.params.get("jaxpr")
            info = getattr(inner, "debug_info", None)
            out.append(
                getattr(info, "func_src_info", None) or str(info)
            )
        for v in eqn.params.values():
            if isinstance(v, jax.extend.core.Jaxpr):
                _walk_eqns(v, out)
            elif isinstance(v, jax.extend.core.ClosedJaxpr):
                _walk_eqns(v.jaxpr, out)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if isinstance(x, jax.extend.core.ClosedJaxpr):
                        _walk_eqns(x.jaxpr, out)
                    elif isinstance(x, jax.extend.core.Jaxpr):
                        _walk_eqns(x, out)
    return out


def test_ring_vjp_uses_fused_backward_kernels():
    devs = jax.devices()[:8]
    mesh = par_mesh.make_mesh(1, 4, 2, devices=devs)
    b, h, s, d = 1, 4, 1024, 64
    q = jnp.zeros((b, h, s, d), jnp.bfloat16)
    k = jnp.zeros_like(q)
    v = jnp.zeros_like(q)

    fn = par_api.make_parallel_sageattn(mesh, is_causal=False)

    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32))

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    names = _walk_eqns(jaxpr.jaxpr, [])
    joined = "\n".join(names)
    assert any("_dq_kernel" in n for n in names), (
        f"fused dq kernel missing from ring VJP; pallas calls:\n{joined}"
    )
    assert any("_dkv_kernel" in n for n in names), (
        f"fused dkv kernel missing from ring VJP; pallas calls:\n{joined}"
    )
    # forward fused kernel present (the launcher's inner closure is
    # named `kernel` and lives in attention_pallas.py)
    assert any(
        "/ops/attention_pallas.py" in n for n in names
    ), f"fused forward kernel missing; pallas calls:\n{joined}"
    assert not any("flash" in n.lower() for n in names), (
        f"flash fallback leaked into the ring VJP:\n{joined}"
    )
