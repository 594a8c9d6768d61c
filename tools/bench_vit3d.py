#!/usr/bin/env python
"""Benchmark: 3D-ViT forward throughput (frames/sec/chip).

The second headline metric from BASELINE.json.  Prints one JSON line
(kept out of bench.py, which the driver expects to emit exactly one line
for the MoE decode metric).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4
N_ITERS = 5


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

    cfg = vit3d_xsmall(dropout=0.0, use_checkpointing=False)
    model = VideoTransformer(cfg)
    th, tw = cfg.target_size
    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (BATCH, cfg.C_in, cfg.max_frames, th, tw),
        jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(1), x)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        params,
    )
    fwd = jax.jit(lambda p, xx: model.apply(p, xx))
    jax.device_get(fwd(params, x))  # compile

    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = fwd(params, x)
    jax.device_get(out)
    dt = time.perf_counter() - t0
    frames_per_sec = BATCH * cfg.max_frames * N_ITERS / dt

    print(
        json.dumps(
            {
                "metric": "vit3d_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 2),
                "unit": "frames/s/chip",
                "config": "vit3d_xsmall (d240/4L, 32 frames @ 128^2, bf16)",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
