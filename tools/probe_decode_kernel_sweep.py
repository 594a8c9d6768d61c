#!/usr/bin/env python
"""Probe: ablate the paged decode kernel to locate its 3-8x roofline gap.

Variants (each a subprocess — the env knobs are read at trace time and the
compile cache keys on them via shape/flag changes):
  * full            — the kernel as shipped (rows=8, window=1)
  * nocompute       — DMAs only (matmul/softmax replaced by a cheap touch)
  * nodma           — compute only (buffers never refilled)
  * rows=16/32      — fewer, fatter grid cells
  * window=2        — 2 pages per chunk
Env: PROBE_BATCH (128), PROBE_CTX (192), PROBE_PS (128).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

VARIANTS = {
    "skel_rows4_us": {"VATS_DECODE_ABLATE": "skeleton", "VATS_DECODE_ROWS": "4"},
    "skel_rows8_us": {"VATS_DECODE_ABLATE": "skeleton"},
    "skel_rows16_us": {"VATS_DECODE_ABLATE": "skeleton", "VATS_DECODE_ROWS": "16"},
}


def worker():
    import math
    import time

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(os.path.dirname(HERE), ".jax_cache")
    )
    from vats_tpu.ops.decode_attention import PagedKVCache, paged_decode_attention

    BATCH = int(os.environ.get("PROBE_BATCH", "128"))
    CTX = int(os.environ.get("PROBE_CTX", "192"))
    PS = int(os.environ.get("PROBE_PS", "128"))
    G, HQ, HD = 8, 24, 64
    N_INNER = 32
    n_pages_seq = (CTX + PS - 1) // PS + 1
    lengths = jnp.full((BATCH,), CTX, jnp.int32)
    scale = 1.0 / math.sqrt(HD)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    cache = PagedKVCache.create(
        num_layers=1, batch_size=BATCH, max_seq_len=n_pages_seq * PS,
        kv_heads=G, head_dim=HD, page_size=PS, dtype=jnp.bfloat16,
    )
    pool = jax.random.normal(ks[1], cache.kv_pages.shape[1:], jnp.bfloat16)
    table = cache.page_table
    q = jax.random.normal(ks[0], (BATCH, HQ, HD), jnp.bfloat16)

    @jax.jit
    def run(q, pool):
        def body(i, acc):
            qi = q * (1.0 + i * 1e-6)
            o = paged_decode_attention(qi, pool, table, lengths, scale=scale)
            return acc + jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, N_INNER, body, jnp.zeros((), jnp.float32))

    jax.device_get(run(q, pool))
    t0 = time.perf_counter()
    jax.device_get(run(q, pool))
    print(json.dumps({"us": round((time.perf_counter() - t0) / N_INNER * 1e6, 1)}),
          flush=True)


def main():
    if os.environ.get("PROBE_WORKER"):
        worker()
        return
    out = {}
    for name, env in VARIANTS.items():
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, PROBE_WORKER="1", **env),
            capture_output=True, text=True, timeout=600,
        )
        got = None
        for line in reversed((r.stdout or "").strip().splitlines()):
            try:
                got = json.loads(line)["us"]
                break
            except Exception:  # noqa: BLE001
                continue
        out[name] = got if got is not None else (r.stderr or "")[-200:]
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
