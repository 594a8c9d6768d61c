#!/usr/bin/env python
"""Single-chip microbench: ring-flash local compute vs the kernels it
composes (VERDICT r4 next-step #4's "local compute at flash-kernel rate").

A ring hop's local work is one flash_attention call with a static
q_pos_offset; this tool times, on ONE chip at a training shape:

  * flash kernel, causal, offset 0            (hop-0 work)
  * flash kernel, all-interior via offset     (hop-i>0 work: every block
    interior — should be the FASTEST, no mask compute at all)
  * XLA oracle at the same shape              (what the old XLA-blockwise
    ring paid per hop)
  * ring_attention on a 1-device mesh         (end-to-end: shard_map +
    merge overhead around one hop)

In-graph fori_loop timing (remote-relay rule: tools/probe_* convention).

Env: RING_PROBE_B, RING_PROBE_T, RING_PROBE_ITERS
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.ops.attention_xla import dot_product_attention
    from vats_tpu.ops.flash_attention import flash_attention
    from vats_tpu.ops.ring_attention import ring_attention
    from vats_tpu.parallel import create_mesh

    b = int(os.environ.get("RING_PROBE_B", "4"))
    t = int(os.environ.get("RING_PROBE_T", "4096"))
    iters = int(os.environ.get("RING_PROBE_ITERS", "10"))
    hq, g, hd = 24, 8, 64
    scale = 1.0 / math.sqrt(hd)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, t, hq, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (b, t, g, hd), jnp.bfloat16)
    v = jax.random.normal(kv, (b, t, g, hd), jnp.bfloat16)

    def timed(f, n=iters):
        @jax.jit
        def run(q, k, v):
            def body(i, acc):
                qi = q * (1.0 + i.astype(q.dtype) * 1e-6)
                out = f(qi, k, v)
                return acc + jnp.sum(out.astype(jnp.float32))

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        jax.device_get(run(q, k, v))
        t0 = time.perf_counter()
        jax.device_get(run(q, k, v))
        return (time.perf_counter() - t0) / n

    res = {"shape": f"B={b} T={t} hq={hq} g={g} hd={hd} bf16 causal"}

    t_flash0 = timed(lambda q, k, v: flash_attention(
        q, k, v, scale=scale, causal=True))
    res["flash_hop0_ms"] = round(t_flash0 * 1e3, 3)
    print(json.dumps(res), flush=True)

    # hop-i>0 local work: causal with q offset == T puts every block in the
    # interior fast path (exactly what a later ring hop computes)
    t_flash_int = timed(lambda q, k, v: flash_attention(
        q, k, v, scale=scale, causal=True, q_pos_offset=t))
    res["flash_interior_hop_ms"] = round(t_flash_int * 1e3, 3)
    print(json.dumps(res), flush=True)

    t_xla = timed(lambda q, k, v: dot_product_attention(
        q, k, v, scale=scale, causal=True))
    res["xla_hop_ms"] = round(t_xla * 1e3, 3)
    res["flash_vs_xla_hop_speedup"] = round(t_xla / t_flash0, 2)
    print(json.dumps(res), flush=True)

    mesh = create_mesh(data=1, fsdp=1, expert=1, tensor=1, seq=1,
                       devices=jax.devices()[:1])
    t_ring = timed(lambda q, k, v: ring_attention(
        q, k, v, mesh=mesh, scale=scale, causal=True))
    res["ring_flash_1dev_ms"] = round(t_ring * 1e3, 3)
    res["ring_overhead_vs_flash"] = round(t_ring / t_flash0, 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
