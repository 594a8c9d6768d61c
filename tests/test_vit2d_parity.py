"""ViT-2D forward parity vs the reference (BASELINE config #2).

Weights imported from the reference ImageEncoderTransformer; forward on
identical input (already at target size so resize/crop are identity) must
match.  The reference's SDPA call uses the default 1/sqrt(head_dim) scale
(optimized_attention.py:396-401) which equals the config's softmax_scale.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

# torchvision is not installed in this container; the reference only uses
# transforms.functional.center_crop — provide a minimal stand-in
if "torchvision" not in sys.modules:
    import types

    def _center_crop(img, output_size):
        th, tw = output_size
        h, w = img.shape[-2], img.shape[-1]
        top = (h - th) // 2
        left = (w - tw) // 2
        return img[..., top : top + th, left : left + tw]

    tv = types.ModuleType("torchvision")
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_functional = types.ModuleType("torchvision.transforms.functional")
    tv_functional.center_crop = _center_crop
    tv_transforms.functional = tv_functional
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_transforms
    sys.modules["torchvision.transforms.functional"] = tv_functional

import jax
import jax.numpy as jnp

from vats_tpu.configs.vit2d import ViT2DArgs
from vats_tpu.models.vit2d import ImageEncoder


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


def test_vit2d_forward_parity_vs_reference():
    from configs.transformers.vision.vit_2d.model_args.model_args_medium import (
        ModelArgs as RefArgs,
    )
    from src.transformers.vision.vit_2d.model import ImageEncoderTransformer

    dims = dict(
        target_size=32, patch_size=8, C_in=3, d_model=64, num_heads=4,
        query_groups=2, d_ffn=128, num_layers=2, left_window=-1,
        right_window=-1, dropout=0.0, rope_theta=30000.0, rms_norm_eps=1e-7,
        use_checkpointing=False, use_windowed_attn=True, use_proj_bias=False,
        use_fused_proj=True, use_mqa=False, use_qk_norm=True,
    )
    ref_args = RefArgs.__new__(RefArgs)
    for k, v in dims.items():
        setattr(ref_args, k, v)
    ref_args.softmax_scale = 1.0 / (dims["d_model"] // dims["num_heads"]) ** 0.5
    torch.manual_seed(0)
    ref = ImageEncoderTransformer(ref_args)
    ref.eval()

    cfg = ViT2DArgs(dtype="float32", **dims)
    model = ImageEncoder(cfg)
    x = np.random.RandomState(1).randn(2, 3, 32, 32).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    raw = unbox(params)["params"]
    sd = ref.state_dict()

    raw["patch_embeddings"]["proj"]["kernel"] = t2j(
        sd["patch_embeddings.proj.weight"]
    ).transpose(2, 3, 1, 0)
    raw["patch_embeddings"]["proj"]["bias"] = t2j(
        sd["patch_embeddings.proj.bias"]
    )
    raw["RMSNorm_0"]["weight"] = t2j(sd["rms_norm.weight"])
    for i in range(cfg.num_layers):
        pre = f"layers.{i}."
        lp = raw[f"layer_{i}"]
        lp["attention_block"]["RMSNorm_0"]["weight"] = t2j(
            sd[pre + "attention_block.rms_norm.weight"]
        )
        lp["attention_block"]["Attention_0"]["w_qkv"]["kernel"] = t2j(
            sd[pre + "attention_block.attention.qkv_proj.weight"]
        ).T
        lp["attention_block"]["Attention_0"]["w_o"]["kernel"] = t2j(
            sd[pre + "attention_block.attention.o_proj.weight"]
        ).T
        lp["ffn_block"]["RMSNorm_0"]["weight"] = t2j(
            sd[pre + "ffn_block.rms_norm.weight"]
        )
        lp["ffn_block"]["SwiGLU_0"]["w_gate"] = t2j(
            sd[pre + "ffn_block.gated_ffn.weight1.weight"]
        ).T
        lp["ffn_block"]["SwiGLU_0"]["w_up"] = t2j(
            sd[pre + "ffn_block.gated_ffn.weight2.weight"]
        ).T
        lp["ffn_block"]["SwiGLU_0"]["w_down"] = t2j(
            sd[pre + "ffn_block.gated_ffn.weight3.weight"]
        ).T
    params = rebox_like({"params": raw}, params)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x))
    out = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), rtol=5e-3, atol=5e-4
    )
