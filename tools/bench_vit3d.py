#!/usr/bin/env python
"""Benchmark: 3D-ViT forward throughput (frames/sec/chip), xsmall AND large.

The second headline metric from BASELINE.json, measured at BOTH declared
reference tiers:

  * xsmall: d240/4L, 32 frames @ 128^2
    (/root/reference/configs/transformers/vision/vit_3d/model_args/model_args_xsmall.py)
  * large:  d2112/32H/20L, 8 frames @ 224^2 — the "1.3B" docstring tier
    (/root/reference/configs/transformers/vision/vit_3d/model_args/model_args_large.py)

Prints one JSON line per tier (kept out of bench.py's single-line contract;
bench.py folds the numbers into its `vit3d` fields).

Env: BENCH_VIT3D_TIERS=xsmall,large  BENCH_VIT3D_BATCH
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 5


def run_tier(tier: str, batch: int):
    import jax
    import jax.numpy as jnp

    from vats_tpu.configs.vit3d import vit3d_large, vit3d_xsmall
    from vats_tpu.models.vit3d import VideoTransformer

    cfg = (vit3d_large if tier == "large" else vit3d_xsmall)(
        dropout=0.0, use_checkpointing=False
    )
    model = VideoTransformer(cfg)
    th, tw = cfg.target_size
    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (batch, cfg.C_in, cfg.max_frames, th, tw),
        jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(1), x)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        params,
    )
    n_params = sum(a.size for a in jax.tree_util.tree_leaves(params))

    # N_ITERS forwards inside ONE jitted fori_loop: per-dispatch timing
    # through the remote-TPU relay is noise-dominated at ~60 ms forwards
    # (identical code measured anywhere from 320 to 4,641 f/s across
    # runs); the input is perturbed per iteration so XLA cannot hoist the
    # loop-invariant model out of the loop
    @jax.jit
    def fwd_loop(p, xx):
        def body(i, acc):
            xi = xx * (1.0 + i.astype(xx.dtype) * 1e-6)
            return acc + jnp.sum(model.apply(p, xi).astype(jnp.float32))

        return jax.lax.fori_loop(0, N_ITERS, body, jnp.zeros((), jnp.float32))

    jax.device_get(fwd_loop(params, x))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(fwd_loop(params, x))
    dt = time.perf_counter() - t0
    frames_per_sec = batch * cfg.max_frames * N_ITERS / dt

    print(
        json.dumps(
            {
                "metric": "vit3d_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 2),
                "unit": "frames/s/chip",
                "config": f"vit3d_{tier} (d{cfg.d_model}/{cfg.num_layers}L, "
                          f"{cfg.max_frames} frames @ {th}x{tw}, "
                          f"{n_params/1e9:.2f}B params, B={batch}, bf16)",
                "vs_baseline": None,
            }
        ),
        flush=True,
    )
    del params
    import gc

    gc.collect()


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    tiers = os.environ.get("BENCH_VIT3D_TIERS", "xsmall,large").split(",")
    batch = int(os.environ.get("BENCH_VIT3D_BATCH", "4"))
    for tier in tiers:
        run_tier(tier.strip(), batch)


if __name__ == "__main__":
    main()
