#!/usr/bin/env python
"""Capture a jax.profiler trace of the bench-tier decode step.

Round-5 ablations showed the paged decode kernel's cost is ~85% fixed
overhead (skeleton ≈ nocompute ≈ nodma ≈ full); per-op XLA timings from a
device trace are the only way to attribute the remaining step time
precisely (defensive pool copies from input/output aliasing, gather cost,
small-op overheads).  Writes the trace under /tmp/decode_trace and prints
the largest device events by self-time if the trace tooling is readable.

Env: PROBE_BATCH (128), PROBE_STEPS (8).
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.configs import nlp_medium
    from vats_tpu.inference.generate import generate_paged
    from vats_tpu.models import TextLM

    batch = int(os.environ.get("PROBE_BATCH", "128"))
    steps = int(os.environ.get("PROBE_STEPS", "8"))
    cfg = nlp_medium(
        dropout=0.0, num_experts=8, top_k=2, param_dtype="bfloat16",
        capacity_factor=1.25, gradient_checkpointing=False,
        max_seq_len=128 + 256, left_window=-1, use_mqa=False,
    )
    model = TextLM(cfg)
    rng = jax.random.PRNGKey(0)
    prompt = jax.random.randint(rng, (batch, 128), 1, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), prompt[:1, :8])

    def run(seed):
        return generate_paged(
            model, params, prompt, None, jax.random.PRNGKey(seed),
            do_sample=True, temperature=0.8, top_k=50, page_size=128,
            max_new_tokens=steps, pad_token_id=0, eos_token_id=None,
            total_len=384,
        )

    jax.device_get(run(0)[0])  # compile + warm
    trace_dir = "/tmp/decode_trace"
    jax.profiler.start_trace(trace_dir)
    jax.device_get(run(1)[0])
    jax.profiler.stop_trace()
    print("trace written", flush=True)

    # best-effort: summarize device op self-times from the .xplane.pb via
    # tensorflow's profiler proto if available, else just list files
    files = glob.glob(trace_dir + "/**/*", recursive=True)
    for f in files:
        print(f, os.path.getsize(f) if os.path.isfile(f) else "dir", flush=True)


if __name__ == "__main__":
    main()
