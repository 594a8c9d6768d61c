#!/usr/bin/env python
"""Probe: flash vs XLA at the ViT-3D XSMALL factorized shapes.

The large tier won 1.7x from routing its tiny-sequence attention to XLA
(FLASH_MIN_SEQ_LEN), but the xsmall tier (d240/4L, 32 frames @ 128^2,
patch (2,8,8) -> grid 16 x 16x16) regressed in the standalone bench.  This
times both impls at the exact xsmall shapes — spatial [B*16, 256],
temporal [B*256, 16] — plus the full model forward under each routing, to
pick the right threshold semantics.

Prints cumulative JSON lines.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOOP = 50


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.configs.vit3d import vit3d_xsmall
    from vats_tpu.models.vit3d import VideoTransformer
    from vats_tpu.nn import attention as attn_mod
    from vats_tpu.ops.attention_xla import dot_product_attention
    from vats_tpu.ops.flash_attention import flash_attention

    b = 4
    cfg = vit3d_xsmall(dropout=0.0, use_checkpointing=False)
    th, tw = cfg.target_size
    pt, ph, pw = cfg.patch_size
    gt, gh, gw = cfg.max_frames // pt, th // ph, tw // pw
    hw = gh * gw
    d, hq, g = cfg.d_model, cfg.num_heads, cfg.query_groups
    hd = d // hq
    out = {"tier": f"xsmall d{d}/{cfg.num_layers}L {hq}h/{g}g hd{hd}, "
                   f"B={b}, grid t{gt} x {gh}x{gw}"}

    def emit():
        print(json.dumps(out), flush=True)

    def timed_loop(make_body, x0, n=LOOP):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, x: make_body(x), x)

        jax.device_get(run(x0))
        t0 = time.perf_counter()
        jax.device_get(run(x0))
        return (time.perf_counter() - t0) / n * 1e3

    scale = 1.0 / math.sqrt(hd)
    for name, rows, seq in (("spatial", b * gt, hw), ("temporal", b * hw, gt)):
        k = jax.random.normal(
            jax.random.PRNGKey(3), (rows, seq, g, hd), jnp.bfloat16
        )
        v = jax.random.normal(
            jax.random.PRNGKey(4), (rows, seq, g, hd), jnp.bfloat16
        )
        q0 = jax.random.normal(
            jax.random.PRNGKey(2), (rows, seq, hq, hd), jnp.bfloat16
        )
        t_flash = timed_loop(
            lambda q: flash_attention(q, k, v, scale=scale), q0
        )
        t_xla = timed_loop(
            lambda q: dot_product_attention(q, k, v, scale=scale), q0
        )
        out[f"{name}_attn_ms_per_layer"] = {
            "flash": round(t_flash, 3), "xla": round(t_xla, 3),
            "flash_vs_xla": round(t_xla / t_flash, 2),
            "shape": f"[{rows}, {seq}] x {hq}h hd{hd}",
        }
        emit()

    # full forward under each routing threshold
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
    for label, thresh in (("xla_below_256", 256), ("always_flash", 0)):
        attn_mod.FLASH_MIN_SEQ_LEN = thresh
        fwd = jax.jit(lambda p, xx: model.apply(p, xx))
        jax.device_get(fwd(params, x))
        n_fwd = 10
        t0 = time.perf_counter()
        for _ in range(n_fwd):
            o = fwd(params, x)
        jax.device_get(o)
        ms = (time.perf_counter() - t0) / n_fwd * 1e3
        out[f"forward_{label}"] = {
            "ms": round(ms, 2),
            "frames_per_sec": round(b * cfg.max_frames / (ms / 1e3), 1),
        }
        emit()
        jax.clear_caches()


if __name__ == "__main__":
    main()
