"""Image-gen AR transformer parity vs the reference (BASELINE config #4).

Weights imported from the reference AutoregressiveImageTransformer (codebook
embed, NTK-2D-RoPE causal self-attention, full-MHA cross-attention, SwiGLU
FFN, norms); features on identical (indices, text) inputs must match —
validating the NTK RoPE layout, QK-norm order, and block wiring end-to-end.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from vats_tpu.configs.image_gen import ImageGenArgs
from vats_tpu.models.image_gen import AutoregressiveImageTransformer


def t2j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def unbox(tree):
    from flax.core import meta

    return jax.tree_util.tree_map(
        lambda x: x.unbox() if isinstance(x, meta.AxisMetadata) else x,
        tree, is_leaf=lambda x: isinstance(x, meta.AxisMetadata),
    )


def rebox_like(new_tree, boxed_tree):
    from flax.core import meta

    def f(boxed, new):
        if isinstance(boxed, meta.AxisMetadata):
            return boxed.replace_boxed(new)
        return new

    return jax.tree_util.tree_map(
        f, boxed_tree, new_tree,
        is_leaf=lambda x: isinstance(x, meta.AxisMetadata),
    )


def test_image_gen_transformer_parity_vs_reference():
    from configs.autoregressive_image_gen.autoregressive_transformer.model_args.model_args_xsmall import (  # noqa: E501
        ModelArgs as RefArgs,
    )
    from src.autoregressive_image_gen.autoregressive_transformer.model import (
        AutoregressiveImageTransformer as RefModel,
    )

    dims = dict(
        target_size=32, d_model=64, num_heads=8, query_groups=2,
        max_batch_size=8, d_ffn=128, num_layers=2, dropout=0.0,
        rope_theta=10000.0, use_ntk_rope=True, ntk_scale_factor=0.7,
        left_window=-1, right_window=-1, rms_norm_eps=1e-12,
        vocab_size=128, max_position_embeddings=64, use_checkpointing=False,
        use_proj_bias=False, use_qkv_proj=True, use_qk_norm=True,
        use_causal=True, use_windowed_attn=True, num_embeddings=32,
        commitment_beta=0.7, C_in_out=3,
    )
    ref_args = RefArgs.__new__(RefArgs)
    for k, v in dims.items():
        setattr(ref_args, k, v)
    ref_args.enable_mqa = False
    ref_args.vae_encoder_activation = "relu"
    ref_args.softmax_scale = 1.0 / (dims["d_model"] // dims["num_heads"]) ** 0.5
    torch.manual_seed(0)
    ref = RefModel(ref_args)
    ref.eval()

    cfg = ImageGenArgs(dtype="float32", enable_mqa=False,
                       vae_encoder_activation="relu", **dims)
    model = AutoregressiveImageTransformer(cfg)

    b, gh, gw, t_txt = 2, 4, 4, 6
    rng = np.random.RandomState(1)
    idx = rng.randint(0, dims["num_embeddings"], (b, gh, gw))
    text = rng.randn(b, t_txt, dims["d_model"]).astype(np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(idx), jnp.asarray(text)
    )
    raw = unbox(params)["params"]
    sd = ref.state_dict()

    raw["embedding_proj"]["embedding"] = t2j(sd["embedding_proj.weight"])
    raw["RMSNorm_0"]["weight"] = t2j(sd["rms_norm.weight"])
    for i in range(cfg.num_layers):
        pre = f"layers.{i}."
        lp = raw[f"layer_{i}"]
        cab = lp["causal_attention_block"]
        cab["RMSNorm_0"]["weight"] = t2j(
            sd[pre + "causal_attention_block.rms_norm.weight"]
        )
        cab["Attention_0"]["w_qkv"]["kernel"] = t2j(
            sd[pre + "causal_attention_block.attention.qkv_proj.weight"]
        ).T
        cab["Attention_0"]["w_o"]["kernel"] = t2j(
            sd[pre + "causal_attention_block.attention.o_proj.weight"]
        ).T
        xab = lp["cross_attention_block"]
        xab["RMSNorm_0"]["weight"] = t2j(
            sd[pre + "cross_attention_block.rms_norm.weight"]
        )
        for proj in ("q", "k", "v", "o"):
            xab["CrossAttention_0"][f"w_{proj}"]["kernel"] = t2j(
                sd[pre + f"cross_attention_block.cross_attention.{proj}_proj.weight"]
            ).T
        fb = lp["ffn_block"]
        fb["RMSNorm_0"]["weight"] = t2j(sd[pre + "ffn_block.rms_norm.weight"])
        fb["SwiGLU_0"]["w_gate"] = t2j(
            sd[pre + "ffn_block.gated_ffn.weight1.weight"]
        ).T
        fb["SwiGLU_0"]["w_up"] = t2j(
            sd[pre + "ffn_block.gated_ffn.weight2.weight"]
        ).T
        fb["SwiGLU_0"]["w_down"] = t2j(
            sd[pre + "ffn_block.gated_ffn.weight3.weight"]
        ).T
    params = rebox_like({"params": raw}, params)

    with torch.no_grad():
        ref_out = ref(
            encoding_indices=torch.tensor(idx, dtype=torch.int64),
            text_embeddings=torch.tensor(text),
            use_cache=False,
        )
    out = model.apply(params, jnp.asarray(idx), jnp.asarray(text))
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), rtol=5e-3, atol=5e-4
    )
