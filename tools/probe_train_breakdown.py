#!/usr/bin/env python
"""Probe: where does the medium-tier training step spend its time?

The decode path has a component breakdown (tools/probe_step_breakdown.py);
this is the TRAINING analog at the bench tier (medium dense, d1440/20L,
B=16, T=512).  Variants isolate components by differencing whole-step
timings (per-dispatch timing is meaningless through the remote-TPU relay):

  * fwd-only loss vs fwd+bwd vs full step (backward cost, optimizer cost)
  * flash kernel vs XLA attention (fwd+bwd)         [attention share]
  * fused readout-CE vs materialized [B,T,V] logits [CE strategy cost]
  * remat policy none / dots / full                 [recompute cost]
  * AdamW mu dtype fp32 vs bf16

Prints one JSON line with ms per variant and derived attributions.
Env: PROBE_TRAIN_BATCH (default 16), PROBE_TRAIN_SEQ (512).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 8


def main():
    import jax
    import jax.numpy as jnp

    # PROBE_PRNG=rbg|unsafe_rbg|threefry2x32 — dropout masks at the bench
    # tier are ~60 x [16,512,1440] threefry draws per step; the hardware
    # RBG implementations cost ~10x less on TPU (MaxText sets unsafe_rbg).
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
    out = {"tier": f"medium_dense B={batch} T={seq}"}

    def make_cfg(**kw):
        base = dict(
            dropout=0.1, left_window=-1, use_mqa=False, num_experts=1,
            top_k=1, gradient_checkpointing=True, capacity_factor=1.25,
            max_seq_len=seq, remat_policy="dots",
        )
        base.update(kw)
        return nlp_medium(**base)

    batches = None

    def step_ms(cfg, targs, mode="step"):
        nonlocal batches
        model = TextLM(cfg)
        tx = create_optimizer(targs, 1000)
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0),
            jnp.zeros((batch, seq), jnp.int32),
        )
        if batches is None:
            batches = list(synthetic_lm_batches(
                jax.random.PRNGKey(1), vocab_size=cfg.vocab_size,
                batch_size=batch, seq_len=seq, num_batches=N + 1,
            ))
        if mode == "step":
            f = make_train_step(model, targs)

            def run(state, b, r):
                return f(state, b, r)
        else:
            raw = __import__(
                "vats_tpu.train.loop", fromlist=["make_train_step_fn"]
            ).make_train_step_fn(model, targs)

            def fwd_or_grad(state, b, r):
                def loss_fn(p):
                    logits, _, aux = model.apply(
                        {"params": p}, b["input_ids"],
                        deterministic=False, rngs={"dropout": r},
                    )
                    from vats_tpu.train.metrics import compute_loss

                    total, _, _ = compute_loss(logits, b["labels"], aux)
                    return total

                if mode == "fwd":
                    return state, {"loss": loss_fn(state.params)}
                g = jax.grad(loss_fn)(state.params)
                from vats_tpu.train.loop import optax_global_norm

                return state, {"loss": optax_global_norm(g)}

            f = jax.jit(fwd_or_grad, donate_argnums=())

            def run(state, b, r):
                return f(state, b, r)

        rng = jax.random.PRNGKey(2)
        state, m = run(state, batches[0], rng)
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        for i in range(1, N + 1):
            rng, srng = jax.random.split(rng)
            state, m = run(state, batches[i], srng)
        jax.device_get(m["loss"])
        return (time.perf_counter() - t0) / N * 1e3

    targs_base = dict(grad_accum_steps=1, fused_ce_chunk=128,
                      adam_mu_dtype="bfloat16")

    variants = {
        # name: (cfg kwargs, targs overrides, mode)
        "full_step_ms": ({}, {}, "step"),  # the bench configuration
        # dropout-cost isolation: dropout=0 removes both the threefry mask
        # generation AND the mask-multiply HBM traffic
        "full_step_nodrop_ms": ({"dropout": 0.0}, {}, "step"),
        "full_step_threefry_drop_ms": (
            {}, {"dropout_rng_impl": "threefry2x32"}, "step"),
        "fwd_bwd_classic_ce_remat_ms": ({}, {}, "grad"),
        # XLA attention under remat='dots' OOMs: the policy saves matmul
        # outputs, and the [B, H, T, T] score matrices ARE matmul outputs
        # (~8 GB over 20 layers at B=16).  Compare at remat='full' against
        # the flash full-remat variant instead.
        "full_step_xla_attn_ms": (
            {"attention_impl": "xla", "remat_policy": "full"}, {}, "step"),
        "full_step_fused_ce256_ms": ({}, {"fused_ce_chunk": 256}, "step"),
        "full_step_fused_ce512_ms": ({}, {"fused_ce_chunk": 512}, "step"),
        "full_step_full_remat_ms": ({"remat_policy": "full"}, {}, "step"),
        "full_step_fp32_mu_ms": ({}, {"adam_mu_dtype": None}, "step"),
        "fwd_only_classic_ce_ms": (
            {"gradient_checkpointing": False}, {}, "fwd"),
        "full_step_classic_ce_ms": ({}, {"fused_ce_chunk": None}, "step"),
        "full_step_no_remat_ms": (
            {"gradient_checkpointing": False}, {}, "step"),
    }

    one = os.environ.get("PROBE_VARIANT")
    if one:
        ckw, tkw, mode = variants[one]
        print(json.dumps({one: round(step_ms(
            make_cfg(**ckw), TrainingArgs(**dict(targs_base, **tkw)),
            mode=mode,
        ), 2)}), flush=True)
        return

    # dispatcher: one SUBPROCESS per variant — remote-HBM freeing between
    # in-process variants is unreliable (a failed variant poisoned every
    # later one with RESOURCE_EXHAUSTED), and a subprocess guarantees it
    import subprocess

    for name in variants:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, PROBE_VARIANT=name),
                capture_output=True, text=True, timeout=1500,
            )
            got = None
            for line in reversed((r.stdout or "").strip().splitlines()):
                if line.startswith("{"):
                    got = json.loads(line)
                    break
            out[name] = got[name] if got else (
                f"error: {(r.stderr or '')[-120:]}"
            )
        except Exception as e:  # noqa: BLE001
            out[name] = f"error: {repr(e)[:100]}"
        print(json.dumps(out), flush=True)  # cumulative; last line wins

    full = out.get("full_step_ms")
    if isinstance(full, float):
        toks = batch * seq
        out["tokens_per_sec_full_step"] = round(toks / (full / 1e3), 1)
        d = {}
        if isinstance(out.get("fwd_bwd_classic_ce_remat_ms"), float):
            d["optimizer_ms"] = round(
                full - out["fwd_bwd_classic_ce_remat_ms"], 2)
        if isinstance(out.get("full_step_xla_attn_ms"), float):
            d["xla_attn_delta_ms"] = round(
                out["full_step_xla_attn_ms"] - full, 2)
        if isinstance(out.get("full_step_classic_ce_ms"), float):
            d["classic_ce_delta_ms"] = round(
                out["full_step_classic_ce_ms"] - full, 2)
        if isinstance(out.get("full_step_no_remat_ms"), float):
            d["remat_cost_ms"] = round(
                full - out["full_step_no_remat_ms"], 2)
        out["derived"] = d
    print(json.dumps(out))


if __name__ == "__main__":
    main()
