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
