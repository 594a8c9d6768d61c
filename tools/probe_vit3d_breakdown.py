#!/usr/bin/env python
"""Probe: where does the ViT-3D large-tier forward spend its time?

The large tier (d2112/32H/20L, 8 frames @ 224^2, patch (2,16,16)) runs
factorized attention at TINY sequence lengths — spatial [B*4, 196],
temporal [B*196, 4] — so this probe times each component at those exact
shapes to explain the gap between measured frames/sec and the matmul
roofline:

  * full model forward (the bench number)
  * patchify (resize + conv3d) alone
  * one spatial / temporal attention layer: flash kernel vs XLA oracle
    (is the Pallas kernel even profitable at 196/4-token sequences?)
  * one FFN (SwiGLU) layer
  * the matmul-only roofline estimate

Prints one JSON line.  Env: PROBE_VIT3D_BATCH (default 4).
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.configs.vit3d import vit3d_large
    from vats_tpu.models.vit3d import VideoTransformer
    from vats_tpu.ops.attention_xla import dot_product_attention
    from vats_tpu.ops.flash_attention import flash_attention

    b = int(os.environ.get("PROBE_VIT3D_BATCH", "4"))
    cfg = vit3d_large(dropout=0.0, use_checkpointing=False)
    th, tw = cfg.target_size
    pt, ph, pw = cfg.patch_size
    gt, gh, gw = cfg.max_frames // pt, th // ph, tw // pw
    hw = gh * gw
    d, hq, g = cfg.d_model, cfg.num_heads, cfg.query_groups
    hd = d // hq
    out = {"tier": f"large d{d}/{cfg.num_layers}L {hq}h/{g}g hd{hd}, "
                   f"B={b}, grid t{gt} x {gh}x{gw}"}

    def timed(f, *args, n=10):
        jax.device_get(f(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*args)
        jax.device_get(o)
        return (time.perf_counter() - t0) / n

    # ---- full forward ----
    model = VideoTransformer(cfg)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (b, cfg.C_in, cfg.max_frames, th, tw),
        jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(1), x)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, params,
    )
    fwd_ms = timed(jax.jit(lambda p, xx: model.apply(p, xx)), params, x) * 1e3
    out["full_forward_ms"] = round(fwd_ms, 2)
    out["frames_per_sec"] = round(b * cfg.max_frames / (fwd_ms / 1e3), 1)

    # ---- attention at the factorized shapes: flash vs XLA ----
    scale = 1.0 / math.sqrt(hd)
    for name, rows, seq in (("spatial", b * gt, hw), ("temporal", b * hw, gt)):
        q = jax.random.normal(
            jax.random.PRNGKey(2), (rows, seq, hq, hd), jnp.bfloat16
        )
        k = jax.random.normal(
            jax.random.PRNGKey(3), (rows, seq, g, hd), jnp.bfloat16
        )
        v = jax.random.normal(
            jax.random.PRNGKey(4), (rows, seq, g, hd), jnp.bfloat16
        )
        t_flash = timed(jax.jit(
            lambda q, k, v: flash_attention(q, k, v, scale=scale)
        ), q, k, v)
        t_xla = timed(jax.jit(
            lambda q, k, v: dot_product_attention(q, k, v, scale=scale)
        ), q, k, v)
        out[f"{name}_attn_ms"] = {
            "flash": round(t_flash * 1e3, 3),
            "xla": round(t_xla * 1e3, 3),
            "flash_vs_xla": round(t_xla / t_flash, 2),
            "shape": f"[{rows}, {seq}] x {hq}h hd{hd}",
        }

    # ---- one FFN-equivalent matmul chain at token count ----
    tokens = b * gt * hw
    xx = jax.random.normal(jax.random.PRNGKey(5), (tokens, d), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(6), (d, cfg.d_ffn), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(7), (d, cfg.d_ffn), jnp.bfloat16)
    w3 = jax.random.normal(jax.random.PRNGKey(8), (cfg.d_ffn, d), jnp.bfloat16)

    def ffn(xx):
        return (jax.nn.silu(xx @ w1) * (xx @ w2)) @ w3

    ffn_ms = timed(jax.jit(ffn), xx) * 1e3
    out["one_ffn_ms"] = round(ffn_ms, 3)
    out["ffn_total_ms"] = round(ffn_ms * cfg.num_layers, 2)

    # ---- qkv/o projection chain at token count ----
    wqkv = jax.random.normal(
        jax.random.PRNGKey(9), (d, (hq + 2 * g) * hd), jnp.bfloat16
    )
    wo = jax.random.normal(jax.random.PRNGKey(10), (d, d), jnp.bfloat16)

    def proj(xx):
        return (xx @ wqkv)[:, :d] @ wo

    proj_ms = timed(jax.jit(proj), xx) * 1e3
    # both spatial and temporal passes project per layer
    out["proj_total_ms"] = round(proj_ms * cfg.num_layers * 2, 2)

    # ---- patchify alone ----
    patch = model.bind(params)
    try:
        embed_fn = jax.jit(lambda xx: patch.patch_embed(xx))
        out["patchify_ms"] = round(timed(embed_fn, x) * 1e3, 2)
    except Exception as e:  # noqa: BLE001 — submodule name may differ
        out["patchify_ms"] = f"n/a ({repr(e)[:80]})"

    # ---- roofline ----
    n_params = sum(a.size for a in jax.tree_util.tree_leaves(params))
    flops = 2 * n_params * tokens  # matmul-dominated estimate
    out["roofline_ms_at_197tflops"] = round(flops / 197e12 * 1e3, 2)
    out["mfu"] = round(flops / (fwd_ms / 1e3) / 197e12, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
