#!/usr/bin/env python
"""Probe: our paged decode kernel vs jax's reference paged_attention.

Round-5 decode attribution (tools/probe_decode_ops.py) put attn_read at
7.4 ms/step over 20 layers (371 us/layer) at B=128, G=8, n=3, hd_pad=64,
ps=128, ctx 192 — ~4x off the ~90 us HBM roofline.  Before rearchitecting,
measure what the stock jax.experimental kernel achieves at the identical
shape, plus ablations of our kernel (pages-per-chunk window, rows per
cell) to locate whether the gap is DMA latency, per-cell overhead, or the
small-M batched matmuls.

Timing: N_INNER iterations inside one jitted fori_loop (remote-relay rule).
Env: PROBE_BATCH (128), PROBE_CTX (192), PROBE_PS (128).
"""

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("PROBE_BATCH", "128"))
CTX = int(os.environ.get("PROBE_CTX", "192"))
PS = int(os.environ.get("PROBE_PS", "128"))
N_INNER = 32
HQ, G, HD = 24, 8, 64


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    bf = jnp.bfloat16
    n_pages_seq = (CTX + PS - 1) // PS + 1
    total_pages = BATCH * n_pages_seq
    lengths = jnp.full((BATCH,), CTX, jnp.int32)
    scale = 1.0 / math.sqrt(HD)

    def timed(fn, *args):
        @jax.jit
        def run(*a):
            def body(i, acc):
                q = a[0] * (1.0 + i * 1e-6)
                return acc + jnp.sum(fn(q, *a[1:]).astype(jnp.float32))
            return jax.lax.fori_loop(0, N_INNER, body, jnp.zeros((), jnp.float32))

        jax.device_get(run(*args))
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        return (time.perf_counter() - t0) / N_INNER * 1e6  # us per call

    results = {"batch": BATCH, "ctx": CTX, "ps": PS}

    def emit(name, v):
        results[name] = round(v, 1)
        print(json.dumps({name: results[name]}), flush=True)

    kv_bytes = BATCH * n_pages_seq * PS * G * HD * 2 * 2
    emit("roofline_us", kv_bytes / 819e9 * 1e6)

    # ---- ours ----
    from vats_tpu.ops.decode_attention import PagedKVCache, paged_decode_attention

    cache = PagedKVCache.create(
        num_layers=1, batch_size=BATCH, max_seq_len=n_pages_seq * PS,
        kv_heads=G, head_dim=HD, page_size=PS, dtype=bf,
    )
    pool = jax.random.normal(ks[1], cache.kv_pages.shape[1:], bf)
    table = cache.page_table
    q = jax.random.normal(ks[0], (BATCH, HQ, HD), bf)

    emit("ours_us", timed(
        lambda q_, pool_, : paged_decode_attention(
            q_, pool_, table, lengths, scale=scale), q, pool))

    # ---- stock jax kernel ----
    from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention

    k_pages = jax.random.normal(ks[2], (G, total_pages, PS, HD), bf)
    v_pages = jax.random.normal(ks[3], (G, total_pages, PS, HD), bf)
    for ppcb in (1, 2):
        if ppcb > n_pages_seq:
            continue
        try:
            emit(f"stock_ppcb{ppcb}_us", timed(
                functools.partial(
                    paged_attention, pages_per_compute_block=ppcb),
                q * scale, k_pages, v_pages, lengths, table))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f"stock_ppcb{ppcb}_error": str(e)[:200]}),
                  flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
