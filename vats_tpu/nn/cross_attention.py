"""Cross-attention (queries from one stream, K/V from another).

Mirrors ``CrossAttention``/``CrossAttentionBlock``
(/root/reference/src/autoregressive_image_gen/autoregressive_transformer/
attention/cross_attention.py:13-280): full multi-head (no GQA), separate
q / k / v / o projections, key-padding mask over the context stream, and a
pre-RMSNorm residual block wrapper.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from vats_tpu.nn.initializers import input_proj_init, output_proj_init
from vats_tpu.nn.norms import RMSNorm
from vats_tpu.ops import dot_product_attention


class CrossAttention(nn.Module):
    d_model: int
    num_heads: int
    softmax_scale: Optional[float] = None
    use_proj_bias: bool = False
    num_layers: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        context_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [B, T_q, d]; context: [B, T_k, d]; context_mask: [B, T_k] bool."""
        if self.d_model % self.num_heads != 0:
            raise ValueError("d_model must be divisible by num_heads")
        hd = self.d_model // self.num_heads
        h = self.num_heads
        b, t_q, _ = x.shape
        t_k = context.shape[1]
        scale = (
            self.softmax_scale
            if self.softmax_scale is not None
            else 1.0 / float(hd) ** 0.5
        )
        dense = lambda feats, name, init, axes: nn.DenseGeneral(  # noqa: E731
            features=feats,
            use_bias=self.use_proj_bias,
            kernel_init=nn.with_logical_partitioning(init, axes),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        in_init = input_proj_init(self.num_layers)
        q = dense(h * hd, "w_q", in_init, ("embed", "heads"))(x)
        k = dense(h * hd, "w_k", in_init, ("embed", "heads"))(context)
        v = dense(h * hd, "w_v", in_init, ("embed", "heads"))(context)
        q = q.reshape(b, t_q, h, hd)
        k = k.reshape(b, t_k, h, hd)
        v = v.reshape(b, t_k, h, hd)
        out = dot_product_attention(
            q, k, v, scale=scale, causal=False, kv_valid=context_mask
        ).reshape(b, t_q, h * hd)
        return dense(
            self.d_model, "w_o", output_proj_init(self.num_layers),
            ("heads", "embed"),
        )(out)


class CrossAttentionBlock(nn.Module):
    """x + dropout(cross_attn(norm(x), context))."""

    d_model: int
    num_heads: int
    softmax_scale: Optional[float] = None
    use_proj_bias: bool = False
    dropout: float = 0.0
    eps: float = 1e-7
    num_layers: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        context_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = RMSNorm(self.d_model, self.eps, self.dtype, self.param_dtype)(x)
        attn = CrossAttention(
            d_model=self.d_model,
            num_heads=self.num_heads,
            softmax_scale=self.softmax_scale,
            use_proj_bias=self.use_proj_bias,
            num_layers=self.num_layers,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(h, context, context_mask)
        attn = nn.Dropout(rate=self.dropout)(attn, deterministic=deterministic)
        return x + attn
