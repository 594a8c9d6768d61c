"""Weight initializers matching the reference's depth-scaled scheme.

Reference: ``AutoregressiveTextTransformer._init_weights``
(/root/reference/src/transformers/nlp/model.py:167-216):

  * embeddings / lm_head:        normal(0, 0.02)
  * qkv / ffn-gate / ffn-up /
    router ("input" projections): xavier_uniform, scaled by
                                  1/sqrt(num_layers/6) when num_layers > 12
  * attn-out / ffn-down
    ("output" projections):       normal(0, 0.02 / sqrt(2*num_layers))
  * RMSNorm scale:                ones
"""

from __future__ import annotations

import math

import jax
from flax import linen as nn

INIT_STD = 0.02


def embed_init():
    return nn.initializers.normal(stddev=INIT_STD)


def input_proj_init(num_layers: int):
    """Xavier-uniform with depth scaling for qkv/gate/up/router projections."""
    base = nn.initializers.xavier_uniform()
    if num_layers <= 12:
        return base

    scale = 1.0 / math.sqrt(num_layers / 6.0)

    def init(key, shape, dtype=jax.numpy.float32):
        return base(key, shape, dtype) * scale

    return init


def output_proj_init(num_layers: int):
    """Depth-scaled normal for o_proj / ffn-down projections."""
    return nn.initializers.normal(stddev=INIT_STD / math.sqrt(2 * num_layers))


def head_init():
    return nn.initializers.normal(stddev=INIT_STD)
