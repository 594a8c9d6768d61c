"""Weight-only int8 quantization for serving.

Single-chip decode at the reference-medium tier is weight-bandwidth-bound:
each step streams the full 8.4 GB of bf16 weights from HBM (measured ~55% of
the v5e's 819 GB/s roof, README "Decode performance").  Storing the large
matmul operands as int8 with per-output-channel scales halves the bytes the
MXU has to pull per step and halves resident weight memory (doubling the
serving batch that fits).  The dequant (convert + scale multiply) happens
inside the jitted decode step, where XLA fuses it into each matmul's operand
load — the bf16 weights are never materialized in HBM.

The reference has no quantized serving path (torch fp32/autocast only,
/root/reference/src/transformers/nlp/inference/generate.py); this is a
TPU-native extension, opt-in via ``TokenGenerator(..., quantize="int8")`` or
``quantize_params`` + ``QuantizedModel`` directly.

Numerics: per-channel symmetric int8 (scale = max|w| / 127 over all axes but
the last).  Norm gains, biases and anything smaller than ``min_size`` stay in
their original dtype.  Parity is guarded by tests/test_quantize.py (logit
cosine vs fp32, greedy-token agreement).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QTensor:
    """An int8-quantized tensor with per-(last-dim)-channel scales."""

    qvalue: jnp.ndarray  # int8, original shape
    scale: jnp.ndarray  # fp32, shape broadcastable to qvalue

    @property
    def shape(self):
        return self.qvalue.shape

    @property
    def size(self):
        return self.qvalue.size


def _is_qtensor(x) -> bool:
    return isinstance(x, QTensor)


def quantize_tensor(w: jnp.ndarray) -> QTensor:
    """Symmetric per-channel int8: one scale per last-dim channel (the
    output-feature axis of Dense/DenseGeneral kernels and stacked expert
    weights; the embedding table quantizes per feature, which keeps the tied
    readout ``x @ E^T`` exact-dequant as well)."""
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return QTensor(qvalue=q, scale=scale)


def dequantize_tensor(q: QTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.qvalue.astype(dtype) * q.scale.astype(dtype)).astype(dtype)


def quantize_params(params: Any, *, min_size: int = 1 << 16) -> Any:
    """Quantize every float leaf with ndim >= 2 and size >= min_size.

    Returns a pytree of identical structure whose large leaves are QTensor;
    apply through :class:`QuantizedModel` (which dequantizes inside jit).
    """

    def f(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.size >= min_size
            and jnp.issubdtype(x.dtype, jnp.floating)
        ):
            return quantize_tensor(x)
        return x

    return jax.tree_util.tree_map(f, params)


def dequantize_params(qparams: Any, dtype=jnp.bfloat16) -> Any:
    def f(x):
        if _is_qtensor(x):
            return dequantize_tensor(x, dtype)
        return x

    return jax.tree_util.tree_map(f, qparams, is_leaf=_is_qtensor)


def quantized_bytes(qparams: Any) -> int:
    """Resident weight bytes of a (partially) quantized tree."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(qparams):
        if hasattr(leaf, "dtype") and hasattr(leaf, "size"):
            total += leaf.size * leaf.dtype.itemsize
    return total


class QuantizedModel:
    """Duck-typed model wrapper: ``apply`` dequantizes inside the jitted
    program so the convert+scale fuses into each matmul's weight load.

    Works with any model the generation loops accept (TextLM, MultimodalLM):
    forwards ``cfg`` / ``init_cache`` / ``init_paged_cache`` to the wrapped
    module.  Hashable by the wrapped model (jit static-arg friendly).
    """

    def __init__(self, model, compute_dtype=jnp.bfloat16):
        self.model = model
        self.cfg = model.cfg
        self.compute_dtype = compute_dtype

    def apply(self, qparams, *args, **kwargs):
        params = dequantize_params(qparams, self.compute_dtype)
        return self.model.apply(params, *args, **kwargs)

    def init_cache(self, *args, **kwargs):
        return self.model.init_cache(*args, **kwargs)

    def init_paged_cache(self, *args, **kwargs):
        return self.model.init_paged_cache(*args, **kwargs)

    def __hash__(self):
        return hash((QuantizedModel, self.model, str(self.compute_dtype)))

    def __eq__(self, other):
        return (
            isinstance(other, QuantizedModel)
            and self.model == other.model
            and self.compute_dtype == other.compute_dtype
        )
