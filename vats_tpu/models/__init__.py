from vats_tpu.models.text_lm import TextLM, TransformerBlock

__all__ = ["TextLM", "TransformerBlock"]
