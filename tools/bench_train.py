#!/usr/bin/env python
"""Benchmark: MoE LM training-step throughput and MFU (tokens/sec/chip).

One donated-state jitted step (fwd + bwd + AdamW) at the largest
reference-tier model that trains on one v5e's 16 GB HBM:

  * tier 'medium_dense' (default on TPU): the reference-medium shapes
    (d1440 / 24h / 8g / 20L / vocab 65536,
    /root/reference/configs/transformers/nlp/model_args/model_args_medium.py)
    with a dense FFN — ~0.88 B params.  fp32 AdamW state is 12 B/param; the
    full E=8 bench tier (4.19 B) cannot hold params+optimizer on one chip
    (training it is the multi-chip FSDP/EP path, tests/test_multichip.py).
  * tier 'medium_moe': the flagship MoE *training* workload (the reference
    trains E=32 top-2 at the large tier,
    /root/reference/training/transformers/nlp/loops/training_loop.py:24-207 +
    model_args_large.py) scaled to the largest expert count whose AdamW
    state fits one v5e chip: d768 / 12L / E=8 top-2 / vocab 65536
    (~0.76 B params; fp32 params+nu and bf16 mu is ~10.6 GB of state).
  * tier 'toy': round-1's d512/8L shapes (kept for CPU smoke / history).

MFU counts fwd+bwd matmul FLOPs (6 * P_active per token) plus the attention
scores/values FLOPs at the bench sequence length.  Prints one JSON line.

Env: BENCH_TRAIN_TIER=medium_dense|toy  BENCH_TRAIN_BATCH  BENCH_TRAIN_SEQ
     BENCH_TRAIN_EXPERTS / BENCH_TRAIN_DISPATCH (expert-count overrides)
     BENCH_TRAIN_REMAT=0|1  BENCH_TRAIN_FUSED_CE=<chunk|0> (default 128:
     fused readout+CE — the fp32 [B, T, V] logits buffer never exists)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 10
PEAK_FLOPS = 197e12  # v5e bf16


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.configs import ModelArgs, TrainingArgs, nlp_medium
    from vats_tpu.data import synthetic_lm_batches
    from vats_tpu.models import TextLM
    from vats_tpu.train import create_optimizer, create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    tier = os.environ.get(
        "BENCH_TRAIN_TIER", "medium_dense" if on_tpu else "toy"
    )
    # medium_dense operating point (measured on one v5e): B=16 with the
    # fused readout+CE, remat_policy='dots' (save matmul outputs, recompute
    # only elementwise math in the bwd) and bf16 AdamW mu — 15.8k tok/s,
    # MFU 0.345.  History: B=12/full/fp32-mu was 13.3k @ 0.291; 'dots'
    # alone 14.8k @ 0.325; the bf16 mu frees 1.4 GB which is what lets
    # B=16 fit without scan_layers (scan fits but runs 17% slower).
    batch = int(os.environ.get(
        "BENCH_TRAIN_BATCH", "16" if tier == "medium_dense" else "16"
    ))
    seq_len = int(os.environ.get("BENCH_TRAIN_SEQ", "512"))
    experts = int(os.environ.get("BENCH_TRAIN_EXPERTS", "0"))
    remat = os.environ.get("BENCH_TRAIN_REMAT", "1") == "1"
    dispatch = os.environ.get("BENCH_TRAIN_DISPATCH", "auto")

    dropout = float(os.environ.get("BENCH_TRAIN_DROPOUT", "0.1"))
    if tier == "medium_dense":
        cfg = nlp_medium(
            dropout=dropout, left_window=-1, use_mqa=False,
            num_experts=experts or 1, top_k=min(2, experts or 1),
            gradient_checkpointing=remat, moe_dispatch=dispatch,
            capacity_factor=1.25, max_seq_len=seq_len,
            scan_layers=os.environ.get("BENCH_TRAIN_SCAN", "0") == "1",
            remat_policy=os.environ.get("BENCH_TRAIN_REMAT_POLICY", "dots"),
        )
    elif tier == "medium_moe":
        cfg = nlp_medium(
            d_model=768, num_heads=12, query_groups=4, d_ffn=3072,
            num_layers=12, dropout=dropout, left_window=-1, use_mqa=False,
            num_experts=experts or 8, top_k=2,
            gradient_checkpointing=remat, moe_dispatch=dispatch,
            capacity_factor=1.25, max_seq_len=seq_len,
            remat_policy=os.environ.get("BENCH_TRAIN_REMAT_POLICY", "dots"),
        )
    else:
        from tools.bench_shapes import BENCH_CFG

        shapes = dict(BENCH_CFG)
        if experts:
            shapes["num_experts"] = experts
        cfg = ModelArgs(
            dropout=0.1, left_window=-1, use_mqa=False,
            gradient_checkpointing=remat and tier != "toy",
            moe_dispatch=dispatch, capacity_factor=1.25, **shapes,
        )

    model = TextLM(cfg)
    fused_ce = int(os.environ.get("BENCH_TRAIN_FUSED_CE", "128"))
    targs = TrainingArgs(
        grad_accum_steps=1, fused_ce_chunk=fused_ce or None,
        adam_mu_dtype=os.environ.get("BENCH_TRAIN_MU_DTYPE", "bfloat16")
        or None,
    )
    tx = create_optimizer(targs, 1000)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.zeros((batch, seq_len), jnp.int32),
    )
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    step = make_train_step(model, targs)
    batches = list(
        synthetic_lm_batches(
            jax.random.PRNGKey(1), vocab_size=cfg.vocab_size,
            batch_size=batch, seq_len=seq_len, num_batches=N_ITERS + 1,
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
    toks = batch * seq_len * N_ITERS
    tps = toks / dt

    # fwd+bwd FLOPs/token: 6 * active params (top_k of E experts + the rest)
    # + attention scores/values: fwd 4*L*H*hd*T_avg, bwd 2x.
    expert_params = cfg.num_layers * 3 * cfg.d_model * cfg.d_ffn * cfg.num_experts
    active = n_params - expert_params + (
        cfg.num_layers * 3 * cfg.d_model * cfg.d_ffn * max(cfg.top_k, 1)
    )
    attn_flops = 3 * (4 * cfg.num_layers * cfg.num_heads * cfg.head_dim * (seq_len / 2))
    flops_per_tok = 6 * active + attn_flops
    mfu = tps * flops_per_tok / PEAK_FLOPS

    print(
        json.dumps(
            {
                "metric": "moe_train_tokens_per_sec_per_chip",
                "value": round(tps, 2),
                "unit": "tokens/s/chip",
                "config": f"{tier}: d{cfg.d_model}/{cfg.num_layers}L "
                          f"E={cfg.num_experts} dispatch={cfg.moe_dispatch} "
                          f"({n_params/1e9:.2f}B params), B={batch}, "
                          f"T={seq_len}, fwd+bwd+AdamW"
                          f"{' +remat' if cfg.gradient_checkpointing else ''}"
                          f"{f' +fusedCE({fused_ce})' if fused_ce else ''}",
                "params_b": round(n_params / 1e9, 3),
                "train_mfu": round(mfu, 4),
                "ms_per_step": round(dt / N_ITERS * 1e3, 1),
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
