#!/usr/bin/env python
"""Benchmark: MoE LM training-step throughput (tokens/sec/chip).

One donated-state jitted step (fwd + bwd + AdamW) at bench.py's model shapes.
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16
SEQ_LEN = 512
N_ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from tools.bench_shapes import BENCH_CFG
    from vats_tpu.configs import ModelArgs, TrainingArgs
    from vats_tpu.data import synthetic_lm_batches
    from vats_tpu.models import TextLM
    from vats_tpu.train import create_optimizer, create_train_state, make_train_step

    shapes = dict(BENCH_CFG)
    # reference-large-tier expert count (E=32 top-2) through the sort-based
    # ragged dispatch: BENCH_TRAIN_EXPERTS=32 BENCH_TRAIN_DISPATCH=sort
    if os.environ.get("BENCH_TRAIN_EXPERTS"):
        shapes["num_experts"] = int(os.environ["BENCH_TRAIN_EXPERTS"])
    cfg = ModelArgs(
        dropout=0.1,
        left_window=-1,
        use_mqa=False,
        gradient_checkpointing=False,
        moe_dispatch=os.environ.get("BENCH_TRAIN_DISPATCH", "scatter"),
        capacity_factor=1.25,
        **shapes,
    )
    model = TextLM(cfg)
    targs = TrainingArgs(grad_accum_steps=1)
    tx = create_optimizer(targs, 1000)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.zeros((BATCH, SEQ_LEN), jnp.int32),
    )
    step = make_train_step(model, targs)
    batches = list(
        synthetic_lm_batches(
            jax.random.PRNGKey(1), vocab_size=cfg.vocab_size,
            batch_size=BATCH, seq_len=SEQ_LEN, num_batches=N_ITERS + 1,
        )
    )
    rng = jax.random.PRNGKey(2)
    state, m = step(state, batches[0], rng)  # compile
    jax.device_get(m["loss"])

    t0 = time.perf_counter()
    for i in range(1, N_ITERS + 1):
        rng, srng = jax.random.split(rng)
        state, m = step(state, batches[i], srng)
    jax.device_get(m["loss"])
    dt = time.perf_counter() - t0
    toks = BATCH * SEQ_LEN * N_ITERS
    print(
        json.dumps(
            {
                "metric": "moe_train_tokens_per_sec_per_chip",
                "value": round(toks / dt, 2),
                "unit": "tokens/s/chip",
                "config": f"bench shapes E={cfg.num_experts} "
                          f"dispatch={cfg.moe_dispatch}, B={BATCH}, "
                          f"T={SEQ_LEN}, fwd+bwd+AdamW (no remat)",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
