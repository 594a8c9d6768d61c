from vats_tpu.ops.attention_xla import dot_product_attention, make_attention_mask

__all__ = ["dot_product_attention", "make_attention_mask"]
