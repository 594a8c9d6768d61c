from vats_tpu.inference.sampling import (
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
    sample_logits,
)
from vats_tpu.inference.generate import TokenGenerator, generate

__all__ = [
    "TokenGenerator",
    "apply_repetition_penalty",
    "apply_top_k",
    "apply_top_p",
    "generate",
    "sample_logits",
]
from vats_tpu.inference.multimodal import generate_multimodal
__all__ += ["generate_multimodal"]
from vats_tpu.inference.quantize import (
    QuantizedModel,
    dequantize_params,
    quantize_params,
)
__all__ += ["QuantizedModel", "dequantize_params", "quantize_params"]
from vats_tpu.inference.serving import (
    PageAllocator,
    SamplingParams,
    ServingEngine,
)
__all__ += ["PageAllocator", "SamplingParams", "ServingEngine"]
