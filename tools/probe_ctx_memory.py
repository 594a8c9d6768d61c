#!/usr/bin/env python
"""Probe: XLA memory analysis of the decode step across contexts.

Compiles (does not run) the same jitted decode fori_loop used by
tools/probe_step_breakdown.py at each PROBE_CTXS value and prints the
compiler's memory_analysis() — argument/output/temp/generated-code bytes.
A host-memory spill or a temp blowup at ctx>=1024 shows up here without
needing a 5-minute timed run.

Usage: PROBE_CTXS=384,1024,2048 python tools/probe_ctx_memory.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("PROBE_BATCH", "128"))
CTXS = [int(c) for c in os.environ.get("PROBE_CTXS", "384,1024").split(",")]


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

    for ctx in CTXS:
        cfg = nlp_medium(
            dropout=0.0, num_experts=1, top_k=1,
            param_dtype="bfloat16", capacity_factor=1.25,
            gradient_checkpointing=False, max_seq_len=ctx, left_window=-1,
            use_mqa=False, num_layers=20,
        )
        model = TextLM(cfg)
        tok = jnp.ones((BATCH, 1), jnp.int32)
        params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(1), tok))

        n_inner = 8

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

        cache = jax.eval_shape(lambda: model.init_cache(BATCH, ctx))
        jstep = jax.jit(many, donate_argnums=(1,))
        compiled = jstep.lower(params, cache).compile()
        ma = compiled.memory_analysis()
        out = {"ctx": ctx}
        for f in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes",
                  "alias_size_in_bytes", "host_argument_size_in_bytes",
                  "host_output_size_in_bytes", "host_temp_size_in_bytes",
                  "host_alias_size_in_bytes"):
            v = getattr(ma, f, None)
            if v:
                out[f.replace("_size_in_bytes", "_mb")] = round(v / 1e6, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
