from sageattention_tpu.ops import reference  # noqa: F401
