#!/usr/bin/env python
"""Probe: where does the ViT-3D large-tier forward spend its time?

The large tier (d2112/32H/20L, 8 frames @ 224^2, patch (2,16,16)) runs
factorized attention at TINY sequence lengths — spatial [B*4, 196],
temporal [B*196, 4].  Per-dispatch timing is meaningless through this
container's remote-TPU relay (~60 ms round trip per call), so every
component is timed as a 50-iteration ``lax.fori_loop`` INSIDE one jitted
program, chaining each iteration's output into the next input so XLA
cannot hoist the loop-invariant work:

  * full model forward (the bench number; one dispatch, big enough to time)
  * one spatial / temporal attention layer: Pallas flash kernel vs XLA
    (is the kernel even profitable at 196-/4-token sequences?)
  * one FFN (SwiGLU) chain and the qkv+o projection chain
  * patchify (resize + conv3d)
  * the matmul-only roofline estimate

Prints cumulative JSON after each component (last line wins).
Env: PROBE_VIT3D_BATCH (default 4).
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

    def emit():
        print(json.dumps(out), flush=True)

    def timed_loop(make_body, x0, n=LOOP):
        """ms per iteration of x -> body(x), chained inside one jit."""
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, x: make_body(x), x)

        jax.device_get(run(x0))  # compile + warm
        t0 = time.perf_counter()
        jax.device_get(run(x0))
        return (time.perf_counter() - t0) / n * 1e3

    # ---- full forward (one dispatch is ~200 ms — big enough to time) ----
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
    fwd = jax.jit(lambda p, xx: model.apply(p, xx))
    jax.device_get(fwd(params, x))
    n_fwd = 10
    t0 = time.perf_counter()
    for _ in range(n_fwd):
        o = fwd(params, x)
    jax.device_get(o)
    fwd_ms = (time.perf_counter() - t0) / n_fwd * 1e3
    out["full_forward_ms"] = round(fwd_ms, 2)
    out["frames_per_sec"] = round(b * cfg.max_frames / (fwd_ms / 1e3), 1)
    emit()

    # ---- attention at the factorized shapes: flash vs XLA (chained) ----
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

        def grow(attn_out):
            # chain output -> next query: [rows, seq, hq, hd] -> same
            return attn_out

        t_flash = timed_loop(
            lambda q: grow(flash_attention(q, k, v, scale=scale)), q0
        )
        t_xla = timed_loop(
            lambda q: grow(dot_product_attention(q, k, v, scale=scale)), q0
        )
        out[f"{name}_attn_ms_per_layer"] = {
            "flash": round(t_flash, 3),
            "xla": round(t_xla, 3),
            "flash_vs_xla": round(t_xla / t_flash, 2),
            "shape": f"[{rows}, {seq}] x {hq}h hd{hd}",
        }
        emit()

    # ---- FFN chain at full token count ----
    tokens = b * gt * hw
    xx0 = jax.random.normal(jax.random.PRNGKey(5), (tokens, d), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(6), (d, cfg.d_ffn), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(7), (d, cfg.d_ffn), jnp.bfloat16)
    w3 = jax.random.normal(jax.random.PRNGKey(8), (cfg.d_ffn, d), jnp.bfloat16)

    ffn_ms = timed_loop(
        lambda xx: (jax.nn.silu(xx @ w1) * (xx @ w2)) @ w3, xx0
    )
    out["one_ffn_ms"] = round(ffn_ms, 3)
    out["ffn_total_ms"] = round(ffn_ms * cfg.num_layers, 2)
    emit()

    # ---- qkv + o projection chain (both factorized passes per layer) ----
    wqkv = jax.random.normal(
        jax.random.PRNGKey(9), (d, (hq + 2 * g) * hd), jnp.bfloat16
    )
    wo = jax.random.normal(jax.random.PRNGKey(10), (hq * hd, d), jnp.bfloat16)
    proj_ms = timed_loop(lambda xx: ((xx @ wqkv)[:, : hq * hd]) @ wo, xx0)
    out["one_proj_ms"] = round(proj_ms, 3)
    out["proj_total_ms"] = round(proj_ms * cfg.num_layers * 2, 2)
    emit()

    # ---- patchify alone (one dispatch; includes resize + conv3d) ----
    try:
        from vats_tpu.models.vit3d import PatchEmbeddings3D

        pe = PatchEmbeddings3D(cfg)
        pe_params = {"params": params["params"]["patch_embeddings"]}
        pf = jax.jit(lambda p, xx: pe.apply(p, xx)[0])
        jax.device_get(pf(pe_params, x))
        t0 = time.perf_counter()
        for _ in range(n_fwd):
            o = pf(pe_params, x)
        jax.device_get(o)
        out["patchify_ms"] = round(
            (time.perf_counter() - t0) / n_fwd * 1e3, 2
        )
    except Exception as e:  # noqa: BLE001
        out["patchify_ms"] = f"n/a ({repr(e)[:80]})"

    # ---- roofline ----
    n_params = sum(a.size for a in jax.tree_util.tree_leaves(params))
    flops = 2 * n_params * tokens  # matmul-dominated estimate
    out["roofline_ms_at_197tflops"] = round(flops / 197e12 * 1e3, 2)
    out["mfu"] = round(flops / (fwd_ms / 1e3) / 197e12, 3)
    emit()


if __name__ == "__main__":
    main()
