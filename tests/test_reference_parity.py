"""Logit parity against the REFERENCE implementation (torch, CPU).

The BASELINE.json oracle: build the reference model, copy its weights into
the vats_tpu param tree, run both forwards on the same inputs, compare
logits.  Uses the reference's uncached full-sequence forward (its cached
decode carries the double-append/RoPE-position defects, SURVEY.md §2.13.8).

Note the reference's SDPA fallback ignores sliding windows and masks query
(not key) rows, so parity configs use no padding and window disabled
(`apply_window_in_xla=False`) — exactly what the reference computes on CPU.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from vats_tpu.configs import ModelArgs
from vats_tpu.models import TextLM


def make_ref_model(d_model, num_heads, query_groups, d_ffn, num_layers,
                   vocab_size, max_seq_len, num_experts, top_k, use_mqa):
    from configs.transformers.nlp.model_args.model_args_xsmall import (
        ModelArgs as RefArgs,
    )

    args = RefArgs.__new__(RefArgs)
    for k, v in dict(
        d_model=d_model, num_heads=num_heads, query_groups=query_groups,
        d_ffn=d_ffn, num_layers=num_layers, dropout=0.0, rope_base=10000.0,
        rms_norm_eps=1e-7, left_window=8, right_window=0,
        vocab_size=vocab_size, max_seq_len=max_seq_len, tie_weights=True,
        max_batch_size=64, gradient_checkpointing=False, use_proj_bias=False,
        use_qkv_proj=True, use_causal=True, use_mqa=use_mqa, use_cache=False,
        num_experts=num_experts, top_k=top_k,
        softmax_scale=1.0 / (d_model // num_heads) ** 0.5,
    ).items():
        setattr(args, k, v)

    from src.transformers.nlp.model import AutoregressiveTextTransformer

    torch.manual_seed(0)
    model = AutoregressiveTextTransformer(args)
    model.eval()
    return model, args


def t2j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def unbox(tree):
    from flax.core import meta

    return jax.tree_util.tree_map(
        lambda x: x.unbox() if isinstance(x, meta.AxisMetadata) else x,
        tree,
        is_leaf=lambda x: isinstance(x, meta.AxisMetadata),
    )


def rebox_like(new_tree, boxed_tree):
    """Put raw arrays back into the boxed (LogicallyPartitioned) structure."""
    from flax.core import meta

    def f(boxed, new):
        if isinstance(boxed, meta.AxisMetadata):
            return boxed.replace_boxed(new)
        return new

    return jax.tree_util.tree_map(
        f, boxed_tree, new_tree,
        is_leaf=lambda x: isinstance(x, meta.AxisMetadata),
    )


def import_textlm_params(ref_model, cfg, boxed_params):
    """Map the reference state into the TextLM param tree."""
    p = unbox(boxed_params)["params"]
    sd = {k: v for k, v in ref_model.state_dict().items()}

    p["token_embed"]["embedding"] = t2j(sd["token_embed.weight"])
    p["RMSNorm_0"]["weight"] = t2j(sd["rms_norm.weight"])
    for i in range(cfg.num_layers):
        lp = p[f"layer_{i}"]
        pre = f"layers.{i}."
        lp["attn_block"]["RMSNorm_0"]["weight"] = t2j(
            sd[pre + "attn_block.rms_norm.weight"]
        )
        lp["attn_block"]["Attention_0"]["w_qkv"]["kernel"] = t2j(
            sd[pre + "attn_block.attn.w_qkv.weight"]
        ).T
        lp["attn_block"]["Attention_0"]["w_o"]["kernel"] = t2j(
            sd[pre + "attn_block.attn.w_o.weight"]
        ).T
        lp["moe_block"]["RMSNorm_0"]["weight"] = t2j(
            sd[pre + "moe_block.rms_norm.weight"]
        )
        ml = lp["moe_block"]["MoELayer_0"]
        ml["RMSNorm_0"]["weight"] = t2j(sd[pre + "moe_block.moe.rms_norm.weight"])
        ml["TopKRouter_0"]["router"] = t2j(
            sd[pre + "moe_block.moe.router.router.weight"]
        ).T
        ml["TopKRouter_0"]["router_bias"] = t2j(
            sd[pre + "moe_block.moe.router.router.bias"]
        )
        gates, ups, downs = [], [], []
        for e in range(cfg.num_experts):
            epre = pre + f"moe_block.moe.experts.{e}."
            gates.append(t2j(sd[epre + "weight1.weight"]).T)
            ups.append(t2j(sd[epre + "weight2.weight"]).T)
            downs.append(t2j(sd[epre + "weight3.weight"]).T)
        ml["ExpertSwiGLU_0"]["w_gate"] = jnp.stack(gates)
        ml["ExpertSwiGLU_0"]["w_up"] = jnp.stack(ups)
        ml["ExpertSwiGLU_0"]["w_down"] = jnp.stack(downs)
    return rebox_like({"params": p}, boxed_params)


@pytest.mark.parametrize(
    "num_experts,top_k,use_mqa,query_groups",
    [(1, 1, False, 2), (4, 2, False, 2), (1, 1, True, 1)],
)
def test_textlm_logit_parity_vs_reference(num_experts, top_k, use_mqa,
                                          query_groups):
    dims = dict(
        d_model=64, num_heads=4, query_groups=query_groups, d_ffn=256,
        num_layers=2, vocab_size=128, max_seq_len=64,
        num_experts=num_experts, top_k=top_k, use_mqa=use_mqa,
    )
    ref_model, ref_args = make_ref_model(**dims)

    cfg = ModelArgs(
        dropout=0.0, left_window=8, apply_window_in_xla=False,
        dtype="float32", gradient_checkpointing=False, tie_weights=True,
        moe_dispatch="dense", **dims,
    )
    model = TextLM(cfg)
    b, t = 2, 24
    rng = np.random.RandomState(0)
    ids = rng.randint(1, dims["vocab_size"], (b, t))

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params = import_textlm_params(ref_model, cfg, params)

    with torch.no_grad():
        ref_logits, _, _ = ref_model(
            torch.tensor(ids, dtype=torch.int64), padding_mask=None,
            use_cache=False,
        )
    jax_logits, _, _ = model.apply(params, jnp.asarray(ids))

    ref_np = ref_logits.numpy()
    jax_np = np.asarray(jax_logits)
    np.testing.assert_allclose(jax_np, ref_np, rtol=5e-3, atol=5e-4)
    # argmax (greedy decisions) must agree everywhere
    np.testing.assert_array_equal(
        jax_np.argmax(-1), ref_np.argmax(-1)
    )


def test_attention_block_parity_vs_reference():
    """Single shared-core AttentionBlock vs the reference's, same weights."""
    from src.optimized_attention import AttentionBlock as RefBlock

    d, h, g = 64, 4, 2
    scale = 1.0 / (d // h) ** 0.5
    torch.manual_seed(1)
    ref = RefBlock(d, h, g, scale, False, True, 0.0, 10000.0, 1e-7)
    ref.eval()

    from vats_tpu.nn.attention import AttentionBlock

    blk = AttentionBlock(
        d_model=d, num_heads=h, query_groups=g, softmax_scale=scale,
        dropout=0.0, dtype=jnp.float32,
    )
    x = np.random.RandomState(2).randn(2, 12, d).astype(np.float32)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), causal=True)

    from flax.core import meta

    raw = jax.tree_util.tree_map(
        lambda p: p.unbox() if isinstance(p, meta.AxisMetadata) else p,
        params,
        is_leaf=lambda p: isinstance(p, meta.AxisMetadata),
    )
    sd = ref.state_dict()
    raw["params"]["RMSNorm_0"]["weight"] = t2j(sd["rms_norm.weight"])
    raw["params"]["Attention_0"]["w_qkv"]["kernel"] = t2j(sd["attn.w_qkv.weight"]).T
    raw["params"]["Attention_0"]["w_o"]["kernel"] = t2j(sd["attn.w_o.weight"]).T
    params = rebox_like(raw, params)

    with torch.no_grad():
        ref_out, _ = ref(
            torch.tensor(x), left_window=-1, right_window=0, causal=True,
            padding_mask=None, kv_cache=None, layer_idx=0, use_cache=False,
            use_mqa=False, use_qk_norm=True,
        )
    out, _ = blk.apply(params, jnp.asarray(x), causal=True)
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), rtol=2e-4, atol=2e-5
    )
