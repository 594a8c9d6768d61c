#!/usr/bin/env python
"""Probe: flash vs XLA attention fwd+bwd at the TRAIN shape (B=16, T=512),
timed with N calls chained inside ONE jitted fori_loop (the remote relay
adds ~50 ms per dispatch, so per-call timing at ~3 ms/op is meaningless).

The round-5 train trace put the flash custom-calls at 62 ms/step (20
layers, fwd+bwd) — ~10x their matmul content at T=512.

Env: PROBE_SHAPE=B,T,Hq,G,D (default 16,512,24,8,60), PROBE_N (16)
"""

import functools
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

    shape = os.environ.get("PROBE_SHAPE", "16,512,24,8,60")
    b, t, hq, g, d = (int(x) for x in shape.split(","))
    n = int(os.environ.get("PROBE_N", "16"))
    scale = 1.0 / math.sqrt(d)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, t, hq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, t, g, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, t, g, d), jnp.bfloat16)

    def timed_chain(attn, mode):
        if mode == "fwdbwd":
            def one(q, k, v):
                def loss(q, k, v):
                    return jnp.sum(attn(q, k, v).astype(jnp.float32))
                gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
                return (jnp.sum(gq.astype(jnp.float32))
                        + jnp.sum(gk.astype(jnp.float32))
                        + jnp.sum(gv.astype(jnp.float32)))
        else:
            def one(q, k, v):
                return jnp.sum(attn(q, k, v).astype(jnp.float32))

        @jax.jit
        def run(q, k, v):
            def body(i, acc):
                qi = q * (1.0 + i * 1e-6)
                return acc + one(qi, k, v)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        jax.device_get(run(q, k, v))
        t0 = time.perf_counter()
        jax.device_get(run(q, k, v))
        return (time.perf_counter() - t0) / n * 1e3

    out = {"shape": shape}

    def emit(name, v):
        out[name] = round(v, 3)
        print(json.dumps({name: out[name]}), flush=True)

    xla = functools.partial(dot_product_attention, scale=scale, causal=True)
    emit("xla_fwd_ms", timed_chain(xla, "fwd"))
    emit("xla_fwdbwd_ms", timed_chain(xla, "fwdbwd"))

    for bq, bk in ((256, 256), (512, 512), (256, 512)):
        fl = functools.partial(
            flash_attention, scale=scale, causal=True,
            block_q=bq, block_k=bk, bwd_block_q=bq, bwd_block_k=bk,
        )
        emit(f"flash_b{bq}x{bk}_fwd_ms", timed_chain(fl, "fwd"))
        emit(f"flash_b{bq}x{bk}_fwdbwd_ms", timed_chain(fl, "fwdbwd"))

    # defaults as the train step uses them
    fl_def = functools.partial(flash_attention, scale=scale, causal=True)
    emit("flash_default_fwd_ms", timed_chain(fl_def, "fwd"))
    emit("flash_default_fwdbwd_ms", timed_chain(fl_def, "fwdbwd"))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
