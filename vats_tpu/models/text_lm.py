"""MoE decoder language model (flagship workload).

TPU-native rebuild of ``AutoregressiveTextTransformer``
(/root/reference/src/transformers/nlp/model.py:113-324):

  token embed -> dropout -> N x (AttentionBlock -> MoEBlock) -> RMSNorm
  -> lm_head (optionally weight-tied, :164-165)

returning ``(logits, cache, total_aux_loss)`` like the reference's
``(logits, cache_outs, total_aux_loss)``.

Differences by design:
  * the KV cache is a functional pytree threaded through the call (the
    reference mutates a model-owned python object, :148-154)
  * gradient checkpointing is ``flax.linen.remat`` over whole blocks
    (reference: torch.utils.checkpoint, :281-294)
  * everything is shape-static so the full train/decode step jits.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vats_tpu.configs.nlp import ModelArgs
from vats_tpu.nn.attention import AttentionBlock
from vats_tpu.nn.initializers import embed_init, head_init
from vats_tpu.nn.kv_cache import KVCache
from vats_tpu.nn.moe import MoEBlock
from vats_tpu.nn.norms import RMSNorm
from vats_tpu.parallel import with_logical_constraint


def resolve_dtype(name: str):
    return {
        "float32": jnp.float32,
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
    }[name]


class TransformerBlock(nn.Module):
    """Attention block followed by MoE block; threads cache and aux loss.

    Reference: /root/reference/src/transformers/nlp/model.py:15-110.
    """

    cfg: ModelArgs

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        paged_cache=None,
        layer_idx: int = 0,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[KVCache], jnp.ndarray]:
        # positional signature (layer_idx/deterministic last) so nn.remat can
        # mark them static via static_argnums
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        x, new_cache = AttentionBlock(
            d_model=cfg.d_model,
            num_heads=cfg.num_heads,
            query_groups=cfg.query_groups,
            rope_theta=cfg.rope_base,
            softmax_scale=cfg.softmax_scale,
            use_proj_bias=cfg.use_proj_bias,
            use_qkv_proj=cfg.use_qkv_proj,
            use_qk_norm=cfg.use_qk_norm,
            dropout=cfg.dropout,
            eps=cfg.rms_norm_eps,
            num_layers=cfg.num_layers,
            impl=cfg.attention_impl,
            context_parallel=getattr(cfg, "context_parallel", "none"),
            dtype=dtype,
            param_dtype=param_dtype,
            name="attn_block",
        )(
            x,
            causal=cfg.use_causal,
            left_window=cfg.left_window if cfg.apply_window_in_xla else -1,
            right_window=cfg.right_window,
            padding_mask=padding_mask,
            cache=cache,
            paged_cache=paged_cache,
            layer_idx=layer_idx,
            segment_ids=segment_ids,
            deterministic=deterministic,
        )
        x, aux_loss = MoEBlock(
            d_model=cfg.d_model,
            d_ffn=cfg.d_ffn,
            num_experts=cfg.num_experts,
            top_k=cfg.top_k,
            dropout=cfg.dropout,
            eps=cfg.rms_norm_eps,
            double_norm=cfg.moe_double_norm,
            dispatch=cfg.moe_dispatch,
            capacity_factor=cfg.capacity_factor,
            num_layers=cfg.num_layers,
            dtype=dtype,
            param_dtype=param_dtype,
            name="moe_block",
        )(x, deterministic=deterministic)
        return x, new_cache, aux_loss


def _remat_block(cfg: ModelArgs):
    """nn.remat(TransformerBlock) under the configured remat_policy.

    'full' recomputes the whole block in the backward pass (minimum
    memory); 'dots' saves every weight-matmul output so the backward pass
    recomputes only elementwise math — worth ~8-10% step time when the
    saved [B, T, d_ffn] activations fit HBM.
    """
    kwargs = dict(static_argnums=(6, 7), prevent_cse=False)
    if cfg.remat_policy == "dots":
        kwargs["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif cfg.remat_policy != "full":
        raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
    return nn.remat(TransformerBlock, **kwargs)


class _ScanBlock(nn.Module):
    """lax.scan adapter over TransformerBlock for O(1)-in-depth compile time.

    Used when ``cfg.scan_layers`` (uncached forwards only — the python loop
    handles KV-cached decode, whose per-layer cache writes need layer
    indices).  Params stack along a leading 'layers' axis."""

    cfg: ModelArgs
    deterministic: bool

    @nn.compact
    def __call__(self, carry, _):
        x, aux_sum, padding_mask, segment_ids = carry
        block_cls = TransformerBlock
        if self.cfg.gradient_checkpointing and not self.deterministic:
            block_cls = _remat_block(self.cfg)
        x, _, aux = block_cls(self.cfg, name="block")(
            x, padding_mask, None, segment_ids, None, 0, self.deterministic
        )
        return (x, aux_sum + aux.astype(jnp.float32), padding_mask, segment_ids), None


class TextLM(nn.Module):
    cfg: ModelArgs

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        paged_cache=None,
        deterministic: bool = True,
        readout_positions: Optional[jnp.ndarray] = None,
        return_hidden: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[KVCache], jnp.ndarray]:
        """input_ids: [B, T] int32 -> (logits [B, T, V] fp32, cache', aux_loss).

        return_hidden: skip the vocab readout and return the post-final-norm
        hidden states [B, T, d] instead of logits — the fused-CE training
        path (train/metrics.py:fused_linear_cross_entropy) applies the
        readout per sequence chunk so the [B, T, V] buffer never exists.

        padding_mask: [B, T] bool, True = valid (reference convention).
        segment_ids: optional [B, T] int for packed multi-document batches
        (attention restricted within equal segments; see data/shard_dataset).
        cache: when given, K/V are appended at cache.length and the cache is
        advanced by T; pass ``None`` for training / uncached forwards.
        readout_positions: optional [B] int32 — compute logits only at these
        per-row positions (returns [B, 1, V]).  Serving prefill uses this to
        avoid materializing the [B, T, V] logit buffer (2.1 GB at the bench
        tier) when only the last valid prompt position feeds sampling.
        """
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)

        embed = nn.Embed(
            num_embeddings=cfg.vocab_size,
            features=cfg.d_model,
            embedding_init=nn.with_logical_partitioning(
                embed_init(), ("vocab", "embed")
            ),
            dtype=dtype,
            param_dtype=param_dtype,
            name="token_embed",
        )
        x = embed(input_ids.astype(jnp.int32))
        x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)
        x = with_logical_constraint(
            x, ("activation_batch", "activation_seq", "activation_embed")
        )

        total_aux = jnp.zeros((), dtype=jnp.float32)
        new_cache = cache
        if cfg.scan_layers and cache is None:
            scanned = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.num_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, deterministic, name="layers")
            (x, total_aux, _, _), _ = scanned(
                (x, total_aux, padding_mask, segment_ids), None
            )
        else:
            block_cls = TransformerBlock
            if cfg.gradient_checkpointing and not deterministic:
                block_cls = _remat_block(cfg)
            new_paged = paged_cache
            # a fresh paged cache (created this call, no history) lets every
            # layer's prefill skip the page-pool gather; layer 0's append
            # clears the per-object flag, so re-pin it for layers 1..N-1 —
            # all layers of one forward see the same (trace-time) freshness
            fresh0 = getattr(paged_cache, "fresh", False)
            for i in range(cfg.num_layers):
                if fresh0 and i > 0:
                    new_paged = new_paged.replace(fresh=True)
                x, returned, aux = block_cls(cfg, name=f"layer_{i}")(
                    x, padding_mask, new_cache, segment_ids, new_paged, i,
                    deterministic,
                )
                if paged_cache is not None:
                    new_paged = returned
                else:
                    new_cache = returned
                total_aux = total_aux + aux.astype(jnp.float32)
            if fresh0:
                new_paged = new_paged.replace(fresh=False)

        t = input_ids.shape[1]
        if paged_cache is not None:
            # ragged advance: each row gains its true token count
            if padding_mask is not None and t > 1:
                counts = jnp.sum(padding_mask.astype(jnp.int32), axis=1)
            else:
                counts = jnp.full((input_ids.shape[0],), t, jnp.int32)
            new_cache = new_paged.advance_by(counts)
        elif new_cache is not None:
            new_cache = new_cache.advance(t)

        x = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)

        if readout_positions is not None:
            x = jnp.take_along_axis(
                x, readout_positions.astype(jnp.int32)[:, None, None], axis=1
            )

        if return_hidden:
            return x, new_cache, total_aux

        if cfg.tie_weights:
            logits = embed.attend(x.astype(param_dtype))
        else:
            logits = nn.DenseGeneral(
                features=cfg.vocab_size,
                use_bias=False,
                kernel_init=nn.with_logical_partitioning(
                    head_init(), ("embed", "vocab")
                ),
                dtype=dtype,
                param_dtype=param_dtype,
                name="lm_head",
            )(x)
        logits = with_logical_constraint(
            logits, ("activation_batch", "activation_seq", None)
        )
        return logits.astype(jnp.float32), new_cache, total_aux

    @staticmethod
    def unstack_scan_params(params: dict, num_layers: int) -> dict:
        """Convert scan-mode params ('layers' stacked along axis 0) to
        loop-mode params ('layer_{i}' subtrees) — e.g. to run KV-cached
        generation on a model trained with scan_layers."""
        import jax

        p = dict(params)
        stacked = p.pop("layers")["block"]
        for i in range(num_layers):
            p[f"layer_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
        return p

    @staticmethod
    def stack_layer_params(params: dict, num_layers: int) -> dict:
        """Inverse of :meth:`unstack_scan_params`."""
        import jax

        p = dict(params)
        layers = [p.pop(f"layer_{i}") for i in range(num_layers)]
        p["layers"] = {
            "block": jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *layers
            )
        }
        return p

    def init_cache(
        self,
        batch_size: int,
        max_seq_len: Optional[int] = None,
        ring: bool = False,
    ) -> KVCache:
        """``ring=True`` allocates a sliding-window ring buffer of
        ``max_seq_len`` SLOTS (callers size it from the SWA window via
        ``kv_cache.ring_slots_for_window``); decode at any context depth
        then reads a window-sized buffer."""
        cfg = self.cfg
        return KVCache.create(
            num_layers=cfg.num_layers,
            batch_size=batch_size,
            max_seq_len=max_seq_len or cfg.max_seq_len,
            kv_heads=cfg.query_groups,
            head_dim=cfg.head_dim,
            dtype=resolve_dtype(cfg.dtype),
            ring=ring,
        )
