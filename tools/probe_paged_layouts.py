#!/usr/bin/env python
"""Probe: paged decode kernel vs dense XLA decode at bench shapes (round 3).

Round-2 history: the head-dim-minor page layout ([P, G, ps=32, hd_pad=128])
measured 434 us/layer (309 GB/s implied, 38% of roof) because every page
DMA streamed a 60->128 lane pad.  This probe times the production
sequence-minor kernel ([P, G, hd_pad8, ps=128]) against the dense-cache XLA
decode and the cache-append scatters.

Each timed op runs N_INNER times inside one jitted fori_loop (the axon relay
costs ~57 ms per dispatch, so per-op cost is only measurable amortized).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.environ.get("PROBE_B", "128"))
G = 8
N = 3  # query heads per group (24 total)
HD = 60
TOTAL = int(os.environ.get("PROBE_TOTAL", "384"))
LEN = int(os.environ.get("PROBE_LEN", "256"))
PS = int(os.environ.get("PROBE_PS", "128"))
N_INNER = 64


def timed_loop(fn, q, name, bytes_per_call=None):
    def many(q0):
        def body(i, acc):
            out = fn(q0 + 1e-6 * i.astype(q0.dtype))
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, N_INNER, body, jnp.zeros((), jnp.float32))

    jmany = jax.jit(many)
    jax.device_get(jmany(q))
    t0 = time.perf_counter()
    n_outer = 3
    for _ in range(n_outer):
        r = jmany(q)
    jax.device_get(r)
    dt = (time.perf_counter() - t0) / (n_outer * N_INNER)
    rec = {"probe": name, "us_per_call": round(dt * 1e6, 1)}
    if bytes_per_call:
        rec["implied_gbps"] = round(bytes_per_call / dt / 1e9, 1)
    print(json.dumps(rec), flush=True)
    return dt


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    assert jax.default_backend() == "tpu"
    from vats_tpu.ops.attention_xla import cached_decode_attention
    from vats_tpu.ops.decode_attention import PagedKVCache, paged_decode_attention

    scale = 1.0 / HD ** 0.5
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, G * N, HD), jnp.bfloat16)
    lengths = jnp.full((B,), LEN, jnp.int32)

    cache = PagedKVCache.create(
        num_layers=1, batch_size=B, max_seq_len=TOTAL, kv_heads=G,
        head_dim=HD, page_size=PS, dtype=jnp.bfloat16,
    )
    hdp = cache.kv_pages.shape[4]
    kvp = jax.random.normal(
        jax.random.PRNGKey(1), cache.kv_pages[0].shape, jnp.bfloat16
    )
    table = cache.page_table
    k_cur = jax.random.normal(jax.random.PRNGKey(7), (B, G, HD), jnp.bfloat16)
    # bytes the kernel actually streams: whole pages covering `LEN` tokens
    used_pages = -(-LEN // PS)
    kv_bytes = B * used_pages * G * hdp * PS * 2 * 2
    timed_loop(
        lambda qq: paged_decode_attention(
            qq, kvp, table, lengths, scale=scale, k_cur=k_cur, v_cur=k_cur
        ),
        q, f"paged_seq_minor_ps{PS}", bytes_per_call=kv_bytes,
    )

    # ---- XLA dense decode on [B, G, hd, S] (the dense cache path) ----
    kd = jax.random.normal(jax.random.PRNGKey(5), (B, G, 64, TOTAL), jnp.bfloat16)
    vd = jax.random.normal(jax.random.PRNGKey(6), (B, G, 64, TOTAL), jnp.bfloat16)
    kv_valid = jnp.arange(TOTAL)[None, :] < lengths[:, None]
    kv_bytes_d = B * TOTAL * G * 64 * 2 * 2

    def dense_fn(qq):
        qp = jnp.pad(qq.reshape(B, 1, G * N, HD), ((0, 0), (0, 0), (0, 0), (0, 4)))
        return cached_decode_attention(
            qp, kd, vd, scale=scale, causal=True,
            left_window=-1, right_window=0,
            q_positions=jnp.full((1,), LEN - 1),
            kv_positions=jnp.arange(TOTAL), kv_valid=kv_valid,
        )[..., :HD].reshape(B, G * N, HD)

    timed_loop(dense_fn, q, name="xla_dense", bytes_per_call=kv_bytes_d)

    # ---- append cost: per-layer scatter vs one batched all-layer scatter ----
    k_new = jax.random.normal(jax.random.PRNGKey(8), (B, G, HD), jnp.bfloat16)
    half = cache.replace(lengths=lengths)

    def app(qq):
        c2 = half.append_token(0, k_new + qq[0, 0, 0], k_new)
        return c2.kv_pages[0, :1, 0, :, :, :1]

    timed_loop(app, q, name="append_one_layer")

    # ---- fused attend+commit kernel (the serving hot path) ----
    from vats_tpu.ops.decode_attention import paged_decode_attention_commit

    pool = cache.replace(lengths=lengths)

    def fused(qq):
        out, _ = paged_decode_attention_commit(
            qq, pool.kv_pages, 0, table, lengths,
            scale=scale, k_cur=k_cur, v_cur=k_cur,
        )
        return out

    timed_loop(fused, q, name="paged_attend_commit", bytes_per_call=kv_bytes)


if __name__ == "__main__":
    main()
