"""Test harness config: run everything on CPU with 8 virtual devices.

Pallas kernels run in interpret mode on CPU; sharding tests use the
8-device virtual mesh (SURVEY.md §4: the test pyramid the reference lacks).

Note: this environment's sitecustomize pre-imports jax and registers the
TPU (axon) backend, so JAX_PLATFORMS env tweaks are too late — the platform
must be forced via jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Set SAGE_TEST_TPU=1 to run the suite on the attached TPU instead (slow:
# every kernel config recompiles; the default CPU run uses interpret mode).
if not os.environ.get("SAGE_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA:CPU's default matmul precision is bf16-grade; golden comparisons need
# exact fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
