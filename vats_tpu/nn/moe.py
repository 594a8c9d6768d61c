"""Mixture-of-Experts: top-k router + shardable expert dispatch.

Reference semantics (/root/reference/src/transformers/nlp/moe.py):
  * TopKRouter (:12-126): linear d_model->E, softmax, top-k, weights
    renormalized by their sum; aux loss = coefficient of variation of the
    per-expert probability mass (train mode only).
  * MoELayer (:128-252): RMSNorm, route, run SwiGLU experts, weighted
    scatter-add.  NOTE the reference applies RMSNorm in BOTH MoELayer and
    MoEBlock (double pre-norm, SURVEY.md §2.13.11) — replicated here behind
    ``double_norm`` (default True) for forward parity.
  * MoEBlock (:255-297): norm + residual wrapper returning (out, aux_loss).

TPU-native design (the reference loops over experts in python with dynamic
``nonzero`` gathers, :212-244 — untraceable under jit):
  * experts are ONE stacked parameter set [E, ...] with logical axis
    'experts' -> mesh axis 'expert'
  * 'dense' dispatch: every expert runs on every token, combined by the
    (mostly zero) combine weights — exact, O(E) flops, right for tiny E
  * 'scatter' dispatch: GShard-style static-shape capacity dispatch via
    one-hot einsums; with the expert axis sharded, XLA lowers the dispatch
    and return einsums to all_to_all over ICI
  * 'sort' dispatch: ragged sort-based dispatch — stable argsort by expert,
    position-in-expert from exclusive-cumsum'd counts, one scatter into the
    [E, C, d] buffers and one gather back.  Memory is O(N·k·d), unlike the
    one-hot dispatch tensors' O(N·k·E·C) — this is the path that scales to
    the reference large tier (E=32 top-2 at 32k context,
    /root/reference/configs/transformers/nlp/model_args/model_args_large.py)
  * capacity_factor <= 0 means capacity == num_tokens (lossless, used for
    parity tests); otherwise capacity = ceil(tokens * top_k / E * factor)
    with overflow tokens dropped (their combine weight is zero, the residual
    passes them through — standard Switch/GShard behavior).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vats_tpu.nn.initializers import input_proj_init, output_proj_init
from vats_tpu.nn.norms import RMSNorm
from vats_tpu.parallel import with_logical_constraint


class TopKRouter(nn.Module):
    d_model: int
    num_experts: int
    top_k: int
    use_aux_loss: bool = True
    num_layers: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: [N, d_model] -> (weights [N, k], indices [N, k], aux_loss []).

        Router math in fp32 for a stable softmax/top-k.
        """
        kernel = self.param(
            "router",
            nn.with_logical_partitioning(
                input_proj_init(self.num_layers), ("embed", "experts")
            ),
            (self.d_model, self.num_experts),
            self.param_dtype,
        )
        bias = self.param(
            "router_bias",
            nn.initializers.zeros,
            (self.num_experts,),
            self.param_dtype,
        )
        logits = (
            jnp.dot(x.astype(jnp.float32), kernel.astype(jnp.float32)) + bias
        )  # [N, E]
        probs = jax.nn.softmax(logits, axis=-1)
        top_vals, top_idx = jax.lax.top_k(probs, self.top_k)
        weights = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)

        aux_loss = jnp.zeros((), dtype=jnp.float32)
        if self.use_aux_loss and not deterministic and self.num_experts > 1:
            # coefficient of variation of per-expert probability mass
            # (/root/reference/src/transformers/nlp/moe.py:110-126).
            # sqrt is epsilon-guarded: at exactly-balanced routing the
            # variance is 0 and d(sqrt)/dx would be inf (NaN grads).
            mass = probs.sum(axis=0)
            frac = mass / mass.sum()
            var = jnp.mean(jnp.square(frac - jnp.mean(frac)))
            aux_loss = jnp.sqrt(var + 1e-12) / jnp.mean(frac)
        return weights.astype(self.dtype), top_idx, aux_loss


class ExpertSwiGLU(nn.Module):
    """Stacked SwiGLU experts: one [E, ...] parameter set, einsum over E."""

    d_model: int
    d_ffn: int
    num_experts: int
    num_layers: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [E, C, d_model] (per-expert token buffers) -> [E, C, d_model]."""
        e, d, f = self.num_experts, self.d_model, self.d_ffn

        def stacked(init):
            def f_(key, shape, dtype):
                keys = jax.random.split(key, shape[0])
                return jnp.stack([init(k, shape[1:], dtype) for k in keys])

            return f_

        w_gate = self.param(
            "w_gate",
            nn.with_logical_partitioning(
                stacked(input_proj_init(self.num_layers)),
                ("experts", "embed", "expert_mlp"),
            ),
            (e, d, f),
            self.param_dtype,
        )
        w_up = self.param(
            "w_up",
            nn.with_logical_partitioning(
                stacked(input_proj_init(self.num_layers)),
                ("experts", "embed", "expert_mlp"),
            ),
            (e, d, f),
            self.param_dtype,
        )
        w_down = self.param(
            "w_down",
            nn.with_logical_partitioning(
                stacked(output_proj_init(self.num_layers)),
                ("experts", "expert_mlp", "embed"),
            ),
            (e, f, d),
            self.param_dtype,
        )
        x = x.astype(self.dtype)
        gate = jnp.einsum("ecd,edf->ecf", x, w_gate.astype(self.dtype))
        up = jnp.einsum("ecd,edf->ecf", x, w_up.astype(self.dtype))
        hidden = jax.nn.silu(gate) * up
        return jnp.einsum("ecf,efd->ecd", hidden, w_down.astype(self.dtype))


class MoELayer(nn.Module):
    d_model: int
    d_ffn: int
    num_experts: int
    top_k: int
    dropout: float = 0.0
    eps: float = 1e-7
    double_norm: bool = True  # reference applies its own RMSNorm (moe.py:190)
    dispatch: str = "auto"  # 'dense' | 'scatter' | 'sort' | 'auto'
    capacity_factor: float = -1.0  # <=0: lossless (capacity == tokens)
    num_layers: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, t, d = x.shape
        if self.double_norm:
            x = RMSNorm(self.d_model, self.eps, self.dtype, self.param_dtype)(x)

        n = b * t
        flat = x.reshape(n, d)
        weights, indices, aux_loss = TopKRouter(
            d_model=self.d_model,
            num_experts=self.num_experts,
            top_k=self.top_k,
            num_layers=self.num_layers,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(flat, deterministic=deterministic)

        experts = ExpertSwiGLU(
            d_model=self.d_model,
            d_ffn=self.d_ffn,
            num_experts=self.num_experts,
            num_layers=self.num_layers,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

        capacity = self._capacity(n)
        mode = self.dispatch
        if mode == "auto":
            if self.num_experts <= 2:
                mode = "dense"
            else:
                # The one-hot dispatch tensor is [N*k, E, C]; past ~2^24
                # elements its HBM cost dwarfs the expert matmuls, so switch
                # to the O(N*k*d) sort-based path at scale.
                onehot_elems = n * self.top_k * self.num_experts * capacity
                mode = "scatter" if onehot_elems <= (1 << 24) else "sort"

        if mode == "dense":
            combine = jnp.zeros((n, self.num_experts), dtype=self.dtype)
            combine = self._scatter_combine(combine, indices, weights)
            all_out = experts(jnp.broadcast_to(flat, (self.num_experts, n, d)))
            out = jnp.einsum("ne,end->nd", combine, all_out)
        elif mode == "sort":
            out = self._sort_dispatch(flat, weights, indices, experts, capacity)
        else:
            out = self._scatter_dispatch(flat, weights, indices, experts, capacity)

        out = out.reshape(b, t, d)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return out.astype(self.dtype), aux_loss

    @staticmethod
    def _scatter_combine(combine, indices, weights):
        n, k = indices.shape
        one_hot = jax.nn.one_hot(indices, combine.shape[-1], dtype=weights.dtype)
        return combine + jnp.einsum("nk,nke->ne", weights, one_hot)

    def _capacity(self, n: int) -> int:
        e, k = self.num_experts, self.top_k
        if self.capacity_factor <= 0:
            return n
        capacity = min(n, int(math.ceil(n * k / e * self.capacity_factor)))
        # lane-align capacity for TPU-friendly buffer shapes
        capacity = max(8, -(-capacity // 8) * 8)
        return min(capacity, n * k)

    def _sort_dispatch(self, flat, weights, indices, experts, capacity):
        """Ragged sort-based dispatch: O(N·k·d) memory instead of the one-hot
        path's O(N·k·E·C) dispatch tensors.

        Same token-priority semantics as ``_scatter_dispatch`` (slot-major:
        every token's top-1 assignment outranks any token's top-2), so the two
        paths drop identical tokens at identical capacities — verified by
        ``tests/test_moe.py``.  Scales to the reference large tier (E=32 top-2
        at long context, /root/reference/configs/transformers/nlp/
        model_args/model_args_large.py) where the one-hot tensors would be
        hundreds of GiB.
        """
        n, d = flat.shape
        e, k = self.num_experts, self.top_k
        nk = n * k

        # slot-major flattening: priority order identical to the one-hot path
        expert_ids = indices.transpose(1, 0).reshape(nk)  # [N*k]
        w_flat = weights.transpose(1, 0).reshape(nk).astype(self.dtype)
        token_ids = jnp.tile(jnp.arange(n, dtype=jnp.int32), (k,))

        # stable sort groups assignments by expert while preserving slot-major
        # order inside each group -> rank-within-group == one-hot cumsum pos
        sort_idx = jnp.argsort(expert_ids, stable=True)  # [N*k]
        sorted_experts = expert_ids[sort_idx]
        counts = jnp.bincount(expert_ids, length=e)  # [E]
        starts = jnp.cumsum(counts) - counts  # exclusive prefix sum
        pos = jnp.arange(nk, dtype=jnp.int32) - starts[sorted_experts]
        keep = pos < capacity
        # overflow assignments land in a trash row that is sliced off before
        # the expert matmuls and gathered back as zeros
        dest = jnp.where(keep, sorted_experts * capacity + pos, e * capacity)

        gathered_in = flat[token_ids[sort_idx]].astype(self.dtype)  # [N*k, d]
        buf = jnp.zeros((e * capacity + 1, d), dtype=self.dtype)
        buf = buf.at[dest].set(gathered_in, mode="drop")
        expert_inputs = buf[: e * capacity].reshape(e, capacity, d)
        expert_inputs = with_logical_constraint(
            expert_inputs, ("experts", None, "activation_embed")
        )
        expert_outputs = experts(expert_inputs)  # [E, C, d]
        expert_outputs = with_logical_constraint(
            expert_outputs, ("experts", None, "activation_embed")
        )
        flat_out = jnp.concatenate(
            [
                expert_outputs.reshape(e * capacity, d),
                jnp.zeros((1, d), dtype=expert_outputs.dtype),
            ]
        )
        out_sorted = flat_out[dest] * w_flat[sort_idx][:, None]  # [N*k, d]
        out = jnp.zeros((n, d), dtype=self.dtype)
        return out.at[token_ids[sort_idx]].add(out_sorted)

    def _scatter_dispatch(self, flat, weights, indices, experts, capacity):
        """GShard-style static capacity dispatch via one-hot einsums."""
        n, d = flat.shape
        e, k = self.num_experts, self.top_k

        # [N, k, E] one-hot assignment, slot-0 first in priority order.
        assign = jax.nn.one_hot(indices, e, dtype=jnp.int32)
        flat_assign = assign.transpose(1, 0, 2).reshape(n * k, e)  # slot-major
        # position of each assignment within its expert's buffer
        pos_in_expert = jnp.cumsum(flat_assign, axis=0) - flat_assign  # [N*k, E]
        pos = jnp.sum(pos_in_expert * flat_assign, axis=-1)  # [N*k]
        keep = pos < capacity
        # dispatch mask [N*k, E, C]
        dispatch = (
            flat_assign[:, :, None]
            * jax.nn.one_hot(pos, capacity, dtype=jnp.int32)[:, None, :]
            * keep[:, None, None]
        ).astype(self.dtype)
        w_flat = weights.transpose(1, 0).reshape(n * k)  # slot-major
        combine = dispatch * w_flat[:, None, None]

        x_rep = jnp.tile(flat, (k, 1))  # slot-major replication of tokens
        expert_inputs = jnp.einsum("sec,sd->ecd", dispatch, x_rep)
        expert_inputs = with_logical_constraint(
            expert_inputs, ("experts", None, "activation_embed")
        )
        expert_outputs = experts(expert_inputs)  # [E, C, d]
        expert_outputs = with_logical_constraint(
            expert_outputs, ("experts", None, "activation_embed")
        )
        out = jnp.einsum("sec,ecd->sd", combine, expert_outputs)  # [N*k, d]
        return out.reshape(k, n, d).sum(axis=0)


class MoEBlock(nn.Module):
    """Pre-RMSNorm -> MoELayer -> dropout -> residual, returns (out, aux).

    Reference: /root/reference/src/transformers/nlp/moe.py:255-297.
    """

    d_model: int
    d_ffn: int
    num_experts: int
    top_k: int
    dropout: float = 0.0
    eps: float = 1e-7
    double_norm: bool = True
    dispatch: str = "auto"
    capacity_factor: float = -1.0
    num_layers: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = RMSNorm(self.d_model, self.eps, self.dtype, self.param_dtype)(x)
        moe_out, aux_loss = MoELayer(
            d_model=self.d_model,
            d_ffn=self.d_ffn,
            num_experts=self.num_experts,
            top_k=self.top_k,
            dropout=self.dropout,
            eps=self.eps,
            double_norm=self.double_norm,
            dispatch=self.dispatch,
            capacity_factor=self.capacity_factor,
            num_layers=self.num_layers,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(h, deterministic=deterministic)
        moe_out = nn.Dropout(rate=self.dropout)(moe_out, deterministic=deterministic)
        return x + moe_out, aux_loss
