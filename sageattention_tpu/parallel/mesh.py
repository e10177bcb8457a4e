"""Device-mesh construction helpers.

The reference delegates all parallelism to xDiT/torchrun over NCCL
(reference: example/run_parallel.sh:48, parallel_sageattn_cogvideo.py:30-39).
The TPU-native equivalent is a named `jax.sharding.Mesh` over ICI/DCN with
axes for data/CFG ("data"), sequence ("seq"), and heads ("heads") —
the degrees mirror xFuserArgs' cfg/ring/ulysses degrees.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    seq: int = 1,
    heads: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a ("data", "seq", "heads") mesh.

    ``data`` carries DP and classifier-free-guidance branches (xDiT
    --use_cfg_parallel), ``seq`` carries ring/context parallelism (xDiT
    --ring_degree), ``heads`` carries Ulysses head parallelism (xDiT
    --ulysses_degree).  Degrees must multiply to the device count, like
    the reference example validates (parallel_sageattn_cogvideo.py:32-36).
    """
    if devices is None:
        devices = jax.devices()
    n = data * seq * heads
    if n != len(devices):
        raise ValueError(
            f"data*seq*heads = {n} must equal device count {len(devices)}"
        )
    arr = np.asarray(devices).reshape(data, seq, heads)
    return Mesh(arr, axis_names=("data", "seq", "heads"))


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join a multi-host TPU slice (the analogue of the reference's
    torchrun/NCCL process-group init, reference: example/run_parallel.sh:48).

    On Cloud TPU the arguments are discovered from the environment; pass
    them explicitly elsewhere.  After this, ``jax.devices()`` spans all
    hosts' chips and :func:`make_mesh` degrees may multiply to the global
    device count — collectives ride ICI within a slice and DCN across
    slices, chosen by XLA from the mesh layout.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(data: int = 1, seq: int = 1, heads: int = 1) -> Mesh:
    """make_mesh over the global (all-hosts) device list, ordered so the
    fastest-varying axes stay ICI-local where possible.

    Uses jax.experimental.mesh_utils.create_device_mesh, which reorders
    devices by physical TPU topology (the plain process-major order a
    raw reshape gives can put a ring axis across DCN).  Falls back to
    the raw reshape off-TPU (e.g. the virtual CPU test mesh), where
    there is no topology to exploit."""
    devices = jax.devices()
    n = data * seq * heads
    if n != len(devices):
        raise ValueError(
            f"data*seq*heads = {n} must equal device count {len(devices)}"
        )
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((data, seq, heads), devices)
        return Mesh(arr, axis_names=("data", "seq", "heads"))
    except Exception:
        return make_mesh(data=data, seq=seq, heads=heads, devices=devices)
