#!/usr/bin/env python
"""Probe: OP-LEVEL decode-step attribution at the bench tier.

probe_step_breakdown.py stops at variant level (full / dense-FFN /
no-layers / int8); this tool times each op CLASS in isolation at the exact
decode shapes (B tokens, T=1, d1440/24h/8g/20L) so the ~10 ms of
"attention-side machinery" the round-4 record left unattributed
(VERDICT r4 weak #2) decomposes into named lines:

  norms        2 RMSNorms per layer on [B, 1, d]
  qkv_o        qkv projection + o projection matmuls
  rope_qknorm  RoPE rotation + QK L2-norm on [B, 1, H, hd]
  attn_read    the Pallas paged decode-attention kernel (fused append)
  dense_ffn    SwiGLU dense FFN (E=1 equivalent)
  router       router matmul + top-k + renorm
  readout      final norm + lm_head matmul + exact top-k=50 sampling
  embed        token embedding gather

Every line is timed as 64 iterations inside ONE jitted fori_loop with
per-iteration input perturbation (remote-relay rule), x20 layers where the
op repeats per layer.  The sum of lines vs the measured full step exposes
any unattributed residual (XLA fusion-boundary cost).

Env: PROBE_BATCH (128), PROBE_CTX (384), PROBE_OPS (csv filter)
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("PROBE_BATCH", "128"))
CTX = int(os.environ.get("PROBE_CTX", "384"))
N_INNER = 64
LAYERS = 20
D, HQ, G, HD, FFN, V, E = 1440, 24, 8, 60, 5760, 65536, 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    bf = jnp.bfloat16

    def timed(build, reps=1):
        """build() -> (fn, x) where fn(x, i) returns a scalar-summable;
        reps multiplies the per-iteration work (per-layer ops use 20)."""
        fn, args = build()

        @jax.jit
        def run(*args):
            def body(i, acc):
                s = jnp.zeros((), jnp.float32)
                for r in range(reps):
                    s = s + fn(i * reps + r, *args)
                return acc + s

            return jax.lax.fori_loop(0, N_INNER, body,
                                     jnp.zeros((), jnp.float32))

        jax.device_get(run(*args))
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        return (time.perf_counter() - t0) / N_INNER

    results = {}

    def emit(name, t):
        results[name] = round(t * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    only = set(filter(None, os.environ.get("PROBE_OPS", "").split(",")))

    def want(name):
        return not only or name in only

    x = jax.random.normal(ks[0], (BATCH, 1, D), bf)

    # ---- norms: 2 per layer ----
    if want("norms"):
        w = jnp.ones((D,), bf)

        def build():
            def fn(i, x, w):
                xi = x * (1.0 + i * 1e-6)
                y = xi * jax.lax.rsqrt(
                    jnp.mean(jnp.square(xi.astype(jnp.float32)), -1,
                             keepdims=True) + 1e-7
                ).astype(bf) * w
                return jnp.sum(y.astype(jnp.float32))
            return fn, (x, w)

        emit("norms_ms", timed(build, reps=2 * LAYERS))

    # ---- qkv + o projections ----
    if want("qkv_o"):
        wqkv = jax.random.normal(ks[1], (D, D + 2 * G * HD), bf) * 0.02
        wo = jax.random.normal(ks[2], (D, D), bf) * 0.02

        def build():
            def fn(i, x, wqkv, wo):
                xi = x[:, 0] * (1.0 + i * 1e-6)
                qkv = xi @ wqkv
                o = qkv[:, :D] @ wo
                return jnp.sum(o.astype(jnp.float32))
            return fn, (x, wqkv, wo)

        emit("qkv_o_ms", timed(build, reps=LAYERS))

    # ---- rope + qk-norm ----
    if want("rope_qknorm"):
        from vats_tpu.nn.rope import apply_rope_1d

        q = jax.random.normal(ks[3], (BATCH, 1, HQ, HD), bf)
        kk = jax.random.normal(ks[4], (BATCH, 1, G, HD), bf)
        pos = jnp.full((BATCH, 1), CTX // 2, jnp.int32)

        def build():
            def fn(i, q, kk, pos):
                qi = q * (1.0 + i * 1e-6)
                qn = qi / jnp.maximum(
                    jnp.linalg.norm(qi.astype(jnp.float32), axis=-1,
                                    keepdims=True), 1e-6
                ).astype(bf)
                kn = kk / jnp.maximum(
                    jnp.linalg.norm(kk.astype(jnp.float32), axis=-1,
                                    keepdims=True), 1e-6
                ).astype(bf)
                qr = apply_rope_1d(qn, pos, 10000.0)
                kr = apply_rope_1d(kn, pos, 10000.0)
                return (jnp.sum(qr.astype(jnp.float32))
                        + jnp.sum(kr.astype(jnp.float32)))
            return fn, (q, kk, pos)

        emit("rope_qknorm_ms", timed(build, reps=LAYERS))

    # ---- paged decode attention (fused append) — one layer's read ----
    if want("attn_read"):
        from vats_tpu.ops.decode_attention import (
            PagedKVCache, paged_decode_attention_commit,
        )

        page_size = 128
        cache = PagedKVCache.create(
            num_layers=1, batch_size=BATCH, max_seq_len=CTX,
            kv_heads=G, head_dim=HD, page_size=page_size, dtype=bf,
        )
        cache = cache.replace(
            lengths=jnp.full((BATCH,), CTX // 2, jnp.int32)
        )
        q = jax.random.normal(ks[5], (BATCH, HQ, HD), bf)
        knew = jax.random.normal(ks[6], (BATCH, G, HD), bf)
        vnew = jax.random.normal(ks[7], (BATCH, G, HD), bf)

        def build():
            def fn(i, q, knew, vnew, pages, tables, lengths):
                qi = q * (1.0 + i * 1e-6)
                out, _ = paged_decode_attention_commit(
                    qi, pages, 0, tables, lengths,
                    scale=1.0 / math.sqrt(HD), k_cur=knew, v_cur=vnew,
                )
                return jnp.sum(out.astype(jnp.float32))
            return fn, (q, knew, vnew, cache.kv_pages, cache.page_table,
                        cache.lengths)

        emit("attn_read_ms", timed(build, reps=LAYERS))

    # ---- dense FFN (per layer, E=1 shape) ----
    if want("dense_ffn"):
        w1 = jax.random.normal(ks[8], (D, FFN), bf) * 0.02
        w2 = jax.random.normal(ks[9], (D, FFN), bf) * 0.02
        w3 = jax.random.normal(ks[10], (FFN, D), bf) * 0.02

        def build():
            def fn(i, x, w1, w2, w3):
                xi = x[:, 0] * (1.0 + i * 1e-6)
                y = (jax.nn.silu(xi @ w1) * (xi @ w2)) @ w3
                return jnp.sum(y.astype(jnp.float32))
            return fn, (x, w1, w2, w3)

        emit("dense_ffn_ms", timed(build, reps=LAYERS))

    # ---- router: matmul + top-k + renorm + sort-dispatch metadata ----
    if want("router"):
        wr = jax.random.normal(ks[11], (D, E), bf) * 0.02

        def build():
            def fn(i, x, wr):
                xi = x[:, 0] * (1.0 + i * 1e-6)
                logits = (xi @ wr).astype(jnp.float32)
                probs = jax.nn.softmax(logits, -1)
                w, idx = jax.lax.top_k(probs, 2)
                w = w / jnp.sum(w, -1, keepdims=True)
                flat = idx.reshape(-1)
                order = jnp.argsort(flat)
                return (jnp.sum(w) + jnp.sum(order.astype(jnp.float32)))
            return fn, (x, wr)

        emit("router_ms", timed(build, reps=LAYERS))

    # ---- readout + sampling ----
    if want("readout"):
        wl = jax.random.normal(ks[12], (D, V), bf) * 0.02

        def build():
            def fn(i, x, wl):
                xi = x[:, 0] * (1.0 + i * 1e-6)
                logits = (xi @ wl).astype(jnp.float32)
                vals, idx = jax.lax.top_k(logits, 50)
                p = jax.nn.softmax(vals / 0.8, -1)
                tok = jnp.argmax(
                    jnp.log(p) + jax.random.gumbel(
                        jax.random.fold_in(jax.random.PRNGKey(0), i), p.shape
                    ), -1
                )
                return jnp.sum(tok.astype(jnp.float32))
            return fn, (x, wl)

        emit("readout_ms", timed(build, reps=1))

    # ---- embedding gather ----
    if want("embed"):
        emb = jax.random.normal(ks[13], (V, D), bf) * 0.02

        def build():
            def fn(i, emb):
                tok = jnp.full((BATCH,), i % 1000 + 1, jnp.int32)
                return jnp.sum(emb[tok].astype(jnp.float32))
            return fn, (emb,)

        emit("embed_ms", timed(build, reps=1))

    total = sum(v for k, v in results.items())
    results["sum_ms"] = round(total, 3)
    results["batch"] = BATCH
    results["ctx"] = CTX
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
