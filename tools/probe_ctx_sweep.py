#!/usr/bin/env python
"""Probe: decode step time vs context depth at the bench (medium, 4.19B) tier.

Two sweeps, both timed as an n-step jitted fori_loop with a donated cache
(the same harness as tools/probe_step_breakdown.py):

  * full attention, dense cache: ctx 384 / 1024 / 2048 / 4096 — step time
    should scale ~linearly in KV bytes now that the in-place Pallas append
    removed the whole-cache copy (ops/cache_append.py).
  * SWA left_window=1024 through the RING cache: ctx 2k / 8k / 32k — the
    buffer is window-sized (1152 slots), so step time should be ~FLAT in
    context depth.  This is the reference xlarge tier's declared operating
    point (max_seq_len=32768, left_window<=1024,
    /root/reference/configs/transformers/nlp/model_args/model_args_xlarge.py).

The cache is constructed at depth directly (length = ctx - n_steps) — a real
32k prefill at B=128 would need the serving stack's chunked prefill; the
steady-state decode cost depends only on cache depth, which this measures.

Usage: PROBE_MODE=ring|dense|both PROBE_BATCH=128 python tools/probe_ctx_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("PROBE_BATCH", "128"))
MODE = os.environ.get("PROBE_MODE", "both")
EXPERTS = int(os.environ.get("PROBE_EXPERTS", "8"))
N_STEPS = int(os.environ.get("PROBE_STEPS", "32"))
WINDOW = int(os.environ.get("PROBE_WINDOW", "1024"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.configs import nlp_medium
    from vats_tpu.models import TextLM
    from vats_tpu.nn.kv_cache import ring_slots_for_window

    def run_point(ctx, left_window, ring, experts=EXPERTS):
        cfg = nlp_medium(
            dropout=0.0, num_experts=experts, top_k=min(2, experts),
            param_dtype="bfloat16", capacity_factor=1.25,
            gradient_checkpointing=False, max_seq_len=ctx,
            left_window=left_window, use_mqa=False,
        )
        model = TextLM(cfg)
        tok = jnp.ones((BATCH, 1), jnp.int32)
        params = model.init(jax.random.PRNGKey(1), tok)
        params = jax.device_put(params)

        slots = ring_slots_for_window(left_window) if ring else ctx
        start_len = ctx - N_STEPS - 1

        def many(p):
            # the cache is created INSIDE the program (zeros -> loop carry is
            # ONE buffer, like the real generate path).  Passing it as a
            # donated argument double-allocates: the donation is unusable
            # (the cache isn't an output), so XLA keeps the 2x5 GB argument
            # AND copies it into fresh loop-carry temps -> OOM at ctx 2048.
            c = model.init_cache(BATCH, slots, ring=ring)
            c = c.replace(length=jnp.int32(start_len))

            def body(i, carry):
                c, acc = carry
                tok_i = jnp.full((BATCH, 1), i % 1000 + 1, jnp.int32)
                logits, c2, _ = model.apply(p, tok_i, cache=c)
                return (c2, acc + jnp.sum(logits.astype(jnp.float32)))

            c2, acc = jax.lax.fori_loop(
                0, N_STEPS, body, (c, jnp.zeros((), jnp.float32))
            )
            return acc, c2.length

        jstep = jax.jit(many)

        acc, ln = jstep(params)  # compile + warm
        jax.device_get(acc)
        t0 = time.perf_counter()
        acc, ln = jstep(params)
        jax.device_get(acc)
        dt = time.perf_counter() - t0
        ms = dt / N_STEPS * 1e3
        print(json.dumps({
            "mode": "ring_swa" if ring else "dense_full",
            "ctx": ctx,
            "left_window": left_window,
            "cache_slots": slots,
            "batch": BATCH,
            "experts": experts,
            "ms_per_step": round(ms, 2),
            "tokens_per_sec": round(BATCH / (dt / N_STEPS), 1),
        }), flush=True)
        del params
        import gc
        gc.collect()

    if MODE in ("dense", "both"):
        # the E=1 dense-FFN variant (the breakdown probe's attention-side
        # isolate): its 1.4 GB weights leave room for the full-context cache
        # at B=128 up to ctx 2048 (the E=8 tier OOMs past ctx ~640)
        for ctx in (384, 1024, 2048):
            run_point(ctx, -1, ring=False, experts=1)
    if MODE in ("ring", "both"):
        # the FULL bench-tier MoE: the ring cache stays window-sized
        # (1152 slots = 0.74 GB at B=128), so depth costs nothing
        for ctx in (2048, 8192, 32768):
            run_point(ctx, WINDOW, ring=True)


if __name__ == "__main__":
    main()
