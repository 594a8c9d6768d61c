"""SwiGLU gated FFN and the pre-norm FFN block.

Reference semantics:
  * SwiGLU: ``w3(silu(w1 x) * (w2 x))`` with bias-free projections and output
    dropout (/root/reference/src/swiglu_activation.py:8-34).
  * FFNBlock: ``x + dropout(swiglu(rms_norm(x)))``
    (/root/reference/src/ffn_block.py:10-36).

TPU notes: the three matmuls plus silu/mul fuse under XLA into two MXU passes;
no custom kernel needed (the reference's xformers swiglu import is dead code,
/root/reference/configs/setup_env.py:22-28).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vats_tpu.nn.initializers import input_proj_init, output_proj_init
from vats_tpu.nn.norms import RMSNorm


class SwiGLU(nn.Module):
    d_model: int
    d_ffn: int
    dropout: float = 0.0
    num_layers: int = 1  # for depth-scaled init
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        gate_kernel = self.param(
            "w_gate",
            nn.with_logical_partitioning(
                input_proj_init(self.num_layers), ("embed", "mlp")
            ),
            (self.d_model, self.d_ffn),
            self.param_dtype,
        )
        up_kernel = self.param(
            "w_up",
            nn.with_logical_partitioning(
                input_proj_init(self.num_layers), ("embed", "mlp")
            ),
            (self.d_model, self.d_ffn),
            self.param_dtype,
        )
        down_kernel = self.param(
            "w_down",
            nn.with_logical_partitioning(
                output_proj_init(self.num_layers), ("mlp", "embed")
            ),
            (self.d_ffn, self.d_model),
            self.param_dtype,
        )
        gate = jnp.dot(x, gate_kernel.astype(self.dtype))
        up = jnp.dot(x, up_kernel.astype(self.dtype))
        hidden = jax.nn.silu(gate) * up
        out = jnp.dot(hidden, down_kernel.astype(self.dtype))
        return nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)


class FFNBlock(nn.Module):
    """Pre-RMSNorm -> SwiGLU -> dropout -> residual."""

    d_model: int
    d_ffn: int
    dropout: float = 0.0
    eps: float = 1e-7
    num_layers: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = RMSNorm(self.d_model, self.eps, self.dtype, self.param_dtype)(x)
        h = SwiGLU(
            self.d_model,
            self.d_ffn,
            self.dropout,
            self.num_layers,
            self.dtype,
            self.param_dtype,
        )(h, deterministic=deterministic)
        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return x + h
