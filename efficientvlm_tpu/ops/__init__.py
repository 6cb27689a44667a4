from .basic import (
    ACT2FN,
    dense,
    embedding_lookup,
    gelu,
    init_dense,
    init_layer_norm,
    layer_norm,
    quick_gelu,
)
from .attention import init_attention, multi_head_attention, make_attention_bias

__all__ = [
    "ACT2FN",
    "dense",
    "embedding_lookup",
    "gelu",
    "init_dense",
    "init_layer_norm",
    "layer_norm",
    "quick_gelu",
    "init_attention",
    "multi_head_attention",
    "make_attention_bias",
]
