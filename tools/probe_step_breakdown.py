#!/usr/bin/env python
"""Probe: decompose the decode step cost at the bench tier (VERDICT item 7).

Times ONE jitted decode step (B tokens through the model with a full dense
KV cache, donated) for model variants that isolate each component:

  * full       — 20L, E=8 top-2 MoE (the bench model)
  * dense_ffn  — 20L, E=1 (same attention, dense FFN: isolates MoE dispatch
                 + expert-matmul efficiency; ~1/4 the FFN weight bytes)
  * no_layers  — 0L (embed + final norm + readout only)
  * int8       — full model with weight-only int8 quantized params

Each line reports ms/step and the implied HBM bandwidth from that variant's
resident weight bytes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("PROBE_BATCH", "128"))
CTX = int(os.environ.get("PROBE_CTX", "384"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.configs import nlp_medium
    from vats_tpu.inference.quantize import QuantizedModel, quantize_params, quantized_bytes
    from vats_tpu.models import TextLM

    def build(num_layers, num_experts, top_k):
        return nlp_medium(
            dropout=0.0, num_experts=num_experts, top_k=top_k,
            param_dtype="bfloat16", capacity_factor=1.25,
            gradient_checkpointing=False, max_seq_len=CTX, left_window=-1,
            use_mqa=False, num_layers=num_layers,
        )

    variants = [
        ("full", build(20, 8, 2), None),
        ("dense_ffn", build(20, 1, 1), None),
        ("no_layers", build(0, 1, 1), None),
        ("int8", build(20, 8, 2), "int8"),
    ]
    only = os.environ.get("PROBE_VARIANTS", "")
    if only:
        keep = set(only.split(","))
        variants = [v for v in variants if v[0] in keep]

    tok = jnp.ones((BATCH, 1), jnp.int32)

    for name, cfg, quant in variants:
        model = TextLM(cfg)
        params = model.init(jax.random.PRNGKey(1), tok)
        if quant == "int8":
            params = quantize_params(params)
            model = QuantizedModel(model)
        wbytes = quantized_bytes(params)

        # time N_INNER steps inside ONE jitted fori_loop — the remote-TPU
        # relay adds a ~57 ms synchronous round trip per dispatch (measured:
        # an embed+readout-only step "costs" 57 ms dispatched alone), so
        # per-step cost is only measurable amortized inside a device loop,
        # exactly like the real decode while_loop
        n_inner = 64

        # scalar output: returning the [B, 1, V] logits would add a 33 MB
        # relay fetch per call (~5 ms/step of pure transfer); the per-step
        # token varies so no iteration is loop-invariant-hoistable
        def many(p, c):
            def body(i, carry):
                c, acc = carry
                tok_i = jnp.full((BATCH, 1), i % 1000 + 1, jnp.int32)
                logits, c2, _ = model.apply(p, tok_i, cache=c)
                return (c2, acc + jnp.sum(logits.astype(jnp.float32)))

            c2, acc = jax.lax.fori_loop(
                0, n_inner, body, (c, jnp.zeros((), jnp.float32))
            )
            return acc, c2

        jstep = jax.jit(many, donate_argnums=(1,))

        cache = model.init_cache(BATCH, CTX)
        # pretend the cache is half full (bench's average decode position)
        cache = cache.replace(length=jnp.asarray(CTX // 2, jnp.int32))
        t0 = time.perf_counter()
        logits, cache = jstep(params, cache)
        jax.device_get(logits)
        compile_s = time.perf_counter() - t0

        n, t0 = 2, time.perf_counter()
        for _ in range(n):
            logits, cache = jstep(params, cache)
        jax.device_get(logits)
        dt = (time.perf_counter() - t0) / (n * n_inner)
        print(json.dumps({
            "probe": name,
            "step_ms": round(dt * 1e3, 3),
            "weight_gb": round(wbytes / 1e9, 3),
            "implied_weight_gbps": round(wbytes / dt / 1e9, 1),
            "compile_s": round(compile_s, 1),
            "batch": BATCH,
            "ctx": CTX,
        }), flush=True)
        del params, cache, model
        import gc
        gc.collect()
        jax.clear_caches()


if __name__ == "__main__":
    main()
