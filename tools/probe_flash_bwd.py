#!/usr/bin/env python
"""Probe: flash-attention BACKWARD block-size sweep vs the XLA path.

The custom-VJP backward kernels (ops/flash_attention.py:_bwd_dkv_kernel /
_bwd_dq_kernel) had hard-capped 512 blocks and no recorded timing; this
sweeps (bwd_block_q, bwd_block_k) at training shapes and prints the
fwd+bwd wall time per combination plus the XLA reference, so the default
can be pinned to measured numbers.

Env: PROBE_SHAPE=B,T,Hq,G,D (default 4,4096,24,8,64)
     PROBE_WINDOW (left window, default -1)
"""

import itertools
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
    from vats_tpu.ops.attention_xla import dot_product_attention
    from vats_tpu.ops.flash_attention import flash_attention

    # B=2 default: the XLA baseline's materialized fwd+bwd scores at B=4
    # T=4096 (2x [4,24,4096,4096] fp32 ~ 12.8 GB) sit at the HBM edge and
    # have wedged the relay; halving batch keeps the comparison honest
    shape = os.environ.get("PROBE_SHAPE", "2,4096,24,8,64")
    b, t, hq, g, d = (int(x) for x in shape.split(","))
    window = int(os.environ.get("PROBE_WINDOW", "-1"))
    scale = 1.0 / math.sqrt(d)

    q = jax.random.normal(jax.random.PRNGKey(0), (b, t, hq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, g, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, g, d), jnp.bfloat16)

    def timed(f, n=5):
        jax.device_get(f(q, k, v))
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(q, k, v)
        jax.device_get(out)
        return (time.perf_counter() - t0) / n

    def grad_of(attn):
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    t_xla = timed(grad_of(lambda q, k, v: dot_product_attention(
        q, k, v, scale=scale, causal=True, left_window=window)))
    print(json.dumps({"xla_fwdbwd_ms": round(t_xla * 1e3, 2),
                      "shape": shape, "window": window}), flush=True)

    results = {}
    for bq, bk in itertools.product((256, 512, 1024), repeat=2):
        try:
            f = grad_of(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, scale=scale, causal=True, left_window=window,
                bwd_block_q=bq, bwd_block_k=bk))
            ms = timed(f) * 1e3
            results[f"bq{bq}_bk{bk}"] = {
                "ms": round(ms, 2),
                "vs_xla": round(t_xla * 1e3 / ms, 2),
            }
        except Exception as e:  # noqa: BLE001 — e.g. VMEM OOM at 1024x1024
            results[f"bq{bq}_bk{bk}"] = {"error": repr(e)[:120]}
        print(json.dumps(results[f"bq{bq}_bk{bk}"] | {"combo": (bq, bk)}),
              flush=True)

    best = min(
        (kk for kk in results if "ms" in results[kk]),
        key=lambda kk: results[kk]["ms"],
        default=None,
    )
    print(json.dumps({"results": results, "best": best,
                      "xla_fwdbwd_ms": round(t_xla * 1e3, 2)}))


if __name__ == "__main__":
    main()
