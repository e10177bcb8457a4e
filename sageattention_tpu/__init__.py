"""sageattention_tpu — TPU-native quantized attention (JAX / Pallas / shard_map).

A brand-new framework with the capabilities of SageAttention (reference:
eliotwang/SageAttention): fused FlashAttention-style kernels where Q.K^T runs
as INT8 on the MXU (per-token / per-subtile / per-block quantization with
K mean-smoothing) and P.V runs in low precision (int8 / fp8 / bf16 with fp32
accumulation policies), plus fused quantization prologue kernels, a drop-in
``sageattn(q, k, v, ...)`` API, varlen (segment-id) batching, GQA, LSE output
for ring attention, and sequence-parallel sharding over TPU meshes.

The reference selects a compiled CUDA/HIP backend per GPU arch at import time
(reference: sageattention/__init__.py:8-95).  On TPU there is a single Pallas
kernel family compiled by Mosaic for whichever TPU generation is present, so
no import-time probing is needed — everything is exported eagerly.
"""

from sageattention_tpu.core import (
    sageattn,
    sageattn_varlen,
    sageattn_qk_int8_pv_bf16,
    sageattn_qk_int8_pv_int8,
    sageattn_qk_int8_pv_fp8,
)
from sageattention_tpu import quant
from sageattention_tpu.ops import reference
from sageattention_tpu.speculative import speculative_verify
from sageattention_tpu.kvcache import (
    PagedKVCache,
    QuantKVCache,
    append_kv,
    calibrate,
    init_kv_cache,
    init_paged_kv_cache,
    paged_append,
    paged_prefill,
    sageattn_decode,
    sageattn_paged_decode,
)

__version__ = "0.1.0"

__all__ = [
    "sageattn",
    "sageattn_varlen",
    "sageattn_qk_int8_pv_bf16",
    "sageattn_qk_int8_pv_int8",
    "sageattn_qk_int8_pv_fp8",
    "quant",
    "reference",
    "QuantKVCache",
    "calibrate",
    "speculative_verify",
    "init_kv_cache",
    "append_kv",
    "sageattn_decode",
    "PagedKVCache",
    "init_paged_kv_cache",
    "paged_append",
    "paged_prefill",
    "sageattn_paged_decode",
    "__version__",
]
