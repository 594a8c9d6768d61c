from vats_tpu.configs.nlp import (
    GenerationArgs,
    ModelArgs,
    TrainingArgs,
    nlp_large,
    nlp_medium,
    nlp_small,
    nlp_xlarge,
    nlp_xsmall,
)

__all__ = [
    "GenerationArgs",
    "ModelArgs",
    "TrainingArgs",
    "nlp_large",
    "nlp_medium",
    "nlp_small",
    "nlp_xlarge",
    "nlp_xsmall",
]
from vats_tpu.configs.multimodal import (
    MultimodalStreamArgs,
    multimodal_small,
    multimodal_xsmall,
)
__all__ += ["MultimodalStreamArgs", "multimodal_small", "multimodal_xsmall"]
