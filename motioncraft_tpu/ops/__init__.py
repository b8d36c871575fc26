from .linear_attention import linear_attention_core, masked_linear_attention  # noqa: F401
