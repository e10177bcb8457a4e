#!/usr/bin/env python
"""Validate the ring's compute/communication overlap in a REAL TPU
schedule — no chips needed.

ring.py issues the ppermute for step t+1 BEFORE step t's attention so
XLA can overlap the ICI transfer with compute.  This tool AOT-compiles
the ring for a v5e 2x2 topology (jax.experimental.topologies — the real
TPU compiler and scheduler, with real Mosaic kernels) and walks the
optimized module order: for each async collective-permute start->done
window it checks whether an attention kernel custom-call is scheduled
inside, i.e. the transfer completes only after compute that hides it.

Exit 0 with "OK" when at least half of the rotation windows contain an
attention kernel; nonzero otherwise.  (Wall-clock verification on real
ICI still needs a multi-chip slice; this validates the schedule the
compiler actually emits for one.)
"""

import re
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from jax.experimental import topologies
    from jax.sharding import Mesh, PartitionSpec as P

    from sageattention_tpu import core
    from sageattention_tpu.parallel.ring import ring_sageattn

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x2x1"
    )
    mesh = Mesh(np.array(topo.devices).reshape(4), ("seq",))
    core._on_cpu = lambda: False  # compile the real Mosaic kernels

    def fn(q, k, v):
        return ring_sageattn(q, k, v, "seq", is_causal=False)

    sm = jax.shard_map(
        fn, mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False,
    )
    spec = jax.ShapeDtypeStruct((1, 4, 4096, 128), jnp.bfloat16)
    hlo = jax.jit(sm).lower(spec, spec, spec).compile().as_text()

    # op DEFINITIONS only ("%name = <type> opcode(...)"); the type may be
    # a tuple with spaces, so classify by the opcode token before '('
    starts = {}   # name -> line
    done_of = {}  # start name -> done line (matched by operand)
    kernels = []  # (line, is_attention)
    for i, ln in enumerate(hlo.splitlines()):
        m = re.match(r"\s*(ROOT\s+)?%([\w.\-]+)\s*=\s*(.*)$", ln)
        if not m:
            continue
        name, rhs = m.group(2), m.group(3)
        if " collective-permute-start(" in rhs:
            starts[name] = i
        elif " collective-permute-done(" in rhs:
            op = re.search(r"collective-permute-done\(%?([\w.\-]+)", rhs)
            if op:
                done_of[op.group(1)] = i
        elif " custom-call(" in rhs and "tpu_custom_call" in rhs:
            kernels.append((i, "sage_attention" in rhs))

    print(f"rotation starts: {len(starts)}; matched dones: "
          f"{len(done_of)}; kernel custom-calls: {len(kernels)} "
          f"({sum(a for _, a in kernels)} attention)")
    if not starts or not kernels:
        print("FAIL: expected async collective-permutes and kernel "
              "custom-calls in the schedule")
        return 1

    with_compute = with_attn = total = 0
    for name, i in sorted(starts.items(), key=lambda kv: kv[1]):
        j = done_of.get(name)
        if j is None:
            continue
        total += 1
        inside = [(li, a) for li, a in kernels if i < li < j]
        if inside:
            with_compute += 1
        if any(a for _, a in inside):
            with_attn += 1
        print(f"  {name}: lines {i}->{j}, kernels inside "
              f"{len(inside)} (attention {sum(a for _, a in inside)})")
    print(f"windows with kernel compute inside: {with_compute}/{total}; "
          f"with attention: {with_attn}/{total}")
    if with_compute * 2 < total:
        print("FAIL: most KV rotations are scheduled as blocking "
              "transfers — the ring schedule does not hide ICI latency")
        return 1
    if with_attn * 2 < total:
        # the docstring contract: the ATTENTION kernels (not just small
        # quant custom-calls) must hide the transfer — they are the only
        # compute long enough to cover an ICI rotation at real sizes
        print("FAIL: rotations overlap only prologue custom-calls; the "
              "attention kernels are serialized after the transfers")
        return 1
    print("OK: the v5e schedule overlaps KV rotation with attention "
          "kernel compute")
    return 0


if __name__ == "__main__":
    sys.exit(main())
