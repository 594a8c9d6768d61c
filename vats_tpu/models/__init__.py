from vats_tpu.models.text_lm import TextLM, TransformerBlock

__all__ = ["TextLM", "TransformerBlock"]
from vats_tpu.models.multimodal import MultimodalLM, multimodal_rope_angles, stream_layout
__all__ += ["MultimodalLM", "multimodal_rope_angles", "stream_layout"]
