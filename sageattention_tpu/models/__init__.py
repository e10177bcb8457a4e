from sageattention_tpu.models.attention import (
    attention,
    set_attention_backend,
    get_attention_backend,
    set_mesh,
    sage_attention_fn,
    SageAttnProcessor,
)
from sageattention_tpu.models.configs import MODEL_CONFIGS, DiTConfig, LLMConfig
from sageattention_tpu.models.dit import VideoDiT
from sageattention_tpu.models.llm import CausalLM
from sageattention_tpu.models.mmdit import (
    CrossAttnVideoDiT,
    DualStreamVideoDiT,
)

__all__ = [
    "attention",
    "set_attention_backend",
    "get_attention_backend",
    "SageAttnProcessor",
    "sage_attention_fn",
    "MODEL_CONFIGS",
    "DiTConfig",
    "LLMConfig",
    "VideoDiT",
    "CausalLM",
    "DualStreamVideoDiT",
    "CrossAttnVideoDiT",
]
