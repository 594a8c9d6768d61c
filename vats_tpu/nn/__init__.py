from vats_tpu.nn.activations import FFNBlock, SwiGLU
from vats_tpu.nn.attention import Attention, AttentionBlock
from vats_tpu.nn.kv_cache import KVCache
from vats_tpu.nn.moe import ExpertSwiGLU, MoEBlock, MoELayer, TopKRouter
from vats_tpu.nn.norms import RMSNorm, l2_normalize
from vats_tpu.nn.rope import (
    apply_rope_1d,
    apply_rope_2d_axial,
    apply_rope_3d_axial,
    apply_rope_interleaved,
    rope_cos_sin,
)

__all__ = [
    "Attention",
    "AttentionBlock",
    "ExpertSwiGLU",
    "FFNBlock",
    "KVCache",
    "MoEBlock",
    "MoELayer",
    "RMSNorm",
    "SwiGLU",
    "TopKRouter",
    "apply_rope_1d",
    "apply_rope_2d_axial",
    "apply_rope_3d_axial",
    "apply_rope_interleaved",
    "l2_normalize",
    "rope_cos_sin",
]
