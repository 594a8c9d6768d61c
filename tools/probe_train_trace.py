#!/usr/bin/env python
"""Capture a jax.profiler trace of the bench-tier TRAIN step and aggregate
per-op device time.

The round-4 record has dense-train MFU 0.33 (target >= 0.45) with only
variant-level attribution; the decode-side trace methodology (see
tools/probe_decode_trace.py) attributes per-op.  Runs N steps of the
bench `train` stage configuration (medium dense, B=16, T=512, remat=dots,
fused CE 128, bf16 mu) and prints the top ops by summed self-time.

Env: PROBE_TRAIN_BATCH (16), PROBE_TRAIN_SEQ (512), PROBE_STEPS (4),
PROBE_DROPOUT (0.1), PROBE_PRNG (unset), PROBE_MOE (0 -> dense tier).
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    prng = os.environ.get("PROBE_PRNG")
    if prng:
        jax.config.update("jax_default_prng_impl", prng)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.configs import TrainingArgs, nlp_medium
    from vats_tpu.data import synthetic_lm_batches
    from vats_tpu.models import TextLM
    from vats_tpu.train import create_optimizer, create_train_state, make_train_step

    batch = int(os.environ.get("PROBE_TRAIN_BATCH", "16"))
    seq = int(os.environ.get("PROBE_TRAIN_SEQ", "512"))
    steps = int(os.environ.get("PROBE_STEPS", "4"))
    moe = os.environ.get("PROBE_MOE", "0") == "1"
    kw = dict(
        dropout=float(os.environ.get("PROBE_DROPOUT", "0.1")),
        left_window=-1, use_mqa=False,
        gradient_checkpointing=True, capacity_factor=1.25,
        max_seq_len=seq, remat_policy="dots",
    )
    if moe:
        kw.update(d_model=768, num_heads=12, query_groups=4, d_ffn=3072,
                  num_layers=12, num_experts=8, top_k=2)
    else:
        kw.update(num_experts=1, top_k=1)
    cfg = nlp_medium(**kw)
    targs = TrainingArgs(grad_accum_steps=1, fused_ce_chunk=128,
                         adam_mu_dtype="bfloat16")
    model = TextLM(cfg)
    tx = create_optimizer(targs, 1000)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((batch, seq), jnp.int32)
    )
    batches = list(synthetic_lm_batches(
        jax.random.PRNGKey(1), vocab_size=cfg.vocab_size,
        batch_size=batch, seq_len=seq, num_batches=steps + 1,
    ))
    f = make_train_step(model, targs)
    rng = jax.random.PRNGKey(2)
    state, m = f(state, batches[0], rng)
    jax.device_get(m["loss"])

    trace_dir = "/tmp/train_trace"
    jax.profiler.start_trace(trace_dir)
    for i in range(1, steps + 1):
        rng, srng = jax.random.split(rng)
        state, m = f(state, batches[i], srng)
    jax.device_get(m["loss"])
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(traces[-1], "rt") as fh:
        d = json.load(fh)
    ev = d.get("traceEvents", [])
    ops = [e for e in ev if e.get("pid") == 3 and e.get("tid") == 3
           and e.get("ph") == "X"]
    agg = collections.Counter()
    cnt = collections.Counter()
    args = {}
    for e in ops:
        base = e["name"].split(".")[0]
        agg[base] += e["dur"]
        cnt[base] += 1
    tot = sum(agg.values())
    print(json.dumps({"total_op_ms": round(tot / 1e3, 1), "steps": steps}),
          flush=True)
    for name, us in agg.most_common(20):
        print(json.dumps({
            "op": name, "ms_per_step": round(us / 1e3 / steps, 3),
            "n_per_step": cnt[name] // steps,
        }), flush=True)
    # top individual instances
    agg2 = collections.Counter()
    cnt2 = collections.Counter()
    for e in ops:
        agg2[e["name"]] += e["dur"]
        cnt2[e["name"]] += 1
        args.setdefault(e["name"], (e.get("args") or {}).get("long_name", ""))
    print("---top-instances---", flush=True)
    for name, us in agg2.most_common(25):
        print(json.dumps({
            "op": name, "ms_per_step": round(us / 1e3 / steps, 3),
            "n": cnt2[name] // steps, "what": str(args[name])[:140],
        }), flush=True)


if __name__ == "__main__":
    main()
