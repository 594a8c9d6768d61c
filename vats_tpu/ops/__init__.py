from vats_tpu.ops.attention_xla import (
    cached_decode_attention,
    dot_product_attention,
    make_attention_mask,
)

__all__ = ["cached_decode_attention", "dot_product_attention", "make_attention_mask"]
