"""RMSNorm with a forced-fp32 numerical island.

Semantics mirror the reference (/root/reference/src/rms_norm.py:7-36):
``weight * x / sqrt(mean(x^2, axis=-1) + eps)`` computed entirely in float32
(the reference disables autocast inside the layer), then cast back to the
module compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    features: int
    eps: float = 1e-7
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != self.features:
            raise ValueError(
                f"RMSNorm expected last dim {self.features}, got {x.shape[-1]}"
            )
        weight = self.param(
            "weight",
            nn.with_logical_partitioning(nn.initializers.ones, ("norm",)),
            (self.features,),
            self.param_dtype,
        )
        x32 = x.astype(jnp.float32)
        rms = jnp.sqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + self.eps)
        y = weight.astype(jnp.float32) * (x32 / rms)
        return y.astype(self.dtype)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """L2-normalize over the last axis (QK-norm).

    Matches ``F.normalize(x, p=2, dim=-1, eps=1e-6)`` semantics used by the
    reference's ``apply_qk_norm`` (/root/reference/utils/attention_utils.py:81-102):
    torch divides by ``max(||x||_2, eps)``.
    """
    x32 = x.astype(jnp.float32)
    # clamp INSIDE the sqrt: sqrt(max(s, eps^2)) == max(sqrt(s), eps)
    # exactly, but unlike norm-then-max it has a defined gradient at x == 0
    # (jnp.linalg.norm's VJP is x/||x|| = 0/0 there). Zero vectors reach this
    # through pipeline-parallel bubble ticks, whose discarded-branch NaNs
    # would otherwise poison the whole backward pass (0 * NaN == NaN).
    sq = jnp.sum(jnp.square(x32), axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return (x32 / norm).astype(x.dtype)
