#!/usr/bin/env python
"""Quality cost of the int8 serving modes at the medium tier.

The 10k+ tok/s int8-W(+KV) serving numbers need an accuracy price tag: this
tool measures, on ONE fixed synthetic batch at the headline medium MoE tier
(d1440/20L E=8 top-2), against the bf16 reference path:

  * teacher-forced full-forward logit max-abs-delta and perplexity for
    int8 weight-only quantization (per-channel symmetric,
    vats_tpu/inference/quantize.py)
  * decode-path perplexity (prefill 128 + teacher-forced paged decode of
    128 positions) for int8 KV pages, int8 weights, and int8 W+KV — the
    exact compute path the serving benchmarks run.

Weights are random-init (the reference repo ships no trained checkpoint to
import — BASELINE.md), so the absolute perplexities are untrained-model
values; the DELTAS between modes measure the quantization noise itself.

Prints one JSON line.  Env: BENCH_INT8_SMOKE=1 for tiny CPU shapes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    smoke = os.environ.get("BENCH_INT8_SMOKE", "") == "1"
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_cpu" if smoke else ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    from vats_tpu.configs import nlp_medium
    from vats_tpu.inference.quantize import QuantizedModel, quantize_params
    from vats_tpu.models import TextLM
    from vats_tpu.ops.decode_attention import PagedKVCache

    if smoke:
        cfg = nlp_medium(
            d_model=96, num_heads=4, query_groups=2, d_ffn=256, num_layers=2,
            vocab_size=512, dropout=0.0, num_experts=4, top_k=2,
            param_dtype="bfloat16", gradient_checkpointing=False,
            max_seq_len=256, left_window=-1, use_mqa=False,
        )
        batch, total_t, prefill_t = 2, 64, 32
    else:
        cfg = nlp_medium(
            dropout=0.0, num_experts=8, top_k=2, param_dtype="bfloat16",
            capacity_factor=1.25, gradient_checkpointing=False,
            max_seq_len=256, left_window=-1, use_mqa=False,
        )
        batch, total_t, prefill_t = 4, 256, 128

    model = TextLM(cfg)
    toks = jax.random.randint(
        jax.random.PRNGKey(3), (batch, total_t), 1, cfg.vocab_size
    )
    params = model.init(jax.random.PRNGKey(1), toks[:1, :8])
    qparams = quantize_params(params)
    qmodel = QuantizedModel(model)

    out = {"config": f"d{cfg.d_model}/{cfg.num_layers}L "
                     f"E{cfg.num_experts}top{cfg.top_k}, B={batch}, "
                     f"T={total_t} (prefill {prefill_t}), random-init"}

    def emit():
        # cumulative; the caller (bench.py) parses the LAST line, so a
        # timeout still records whatever was measured
        print(json.dumps(out), flush=True)

    # ---- teacher-forced full forward: logit delta + perplexity ----
    def fwd(m, p):
        logits, _, _ = m.apply(p, toks, deterministic=True)
        return logits.astype(jnp.float32)

    def ppl_from_logits(logits):
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.exp(jnp.mean(nll))

    l_bf16 = jax.jit(lambda p: fwd(model, p))(params)
    l_int8 = jax.jit(lambda p: fwd(qmodel, p))(qparams)
    out["logit_max_abs_delta_int8w"] = round(
        float(jnp.max(jnp.abs(l_bf16 - l_int8))), 4
    )
    out["logit_rms_int8w_delta"] = round(
        float(jnp.sqrt(jnp.mean((l_bf16 - l_int8) ** 2))), 5
    )
    ppl_bf16 = float(ppl_from_logits(l_bf16))
    ppl_int8w = float(ppl_from_logits(l_int8))
    out["ppl_bf16"] = round(ppl_bf16, 2)
    out["ppl_int8w"] = round(ppl_int8w, 2)
    out["ppl_int8w_delta_pct"] = round(100 * (ppl_int8w / ppl_bf16 - 1), 3)
    emit()
    del l_bf16, l_int8

    # ---- decode-path perplexity through the paged cache ----
    def decode_ppl(m, p, kv_quant):
        def run(p):
            cache = PagedKVCache.create(
                num_layers=cfg.num_layers, batch_size=batch,
                max_seq_len=total_t, kv_heads=cfg.query_groups,
                head_dim=cfg.head_dim, page_size=128,
                dtype=jnp.int8 if kv_quant == "int8" else jnp.bfloat16,
            )
            logits, cache, _ = m.apply(
                p, toks[:, :prefill_t],
                padding_mask=jnp.ones((batch, prefill_t), bool),
                paged_cache=cache, deterministic=True,
            )
            # prefill's last logit predicts position prefill_t
            logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32))
            nll0 = -jnp.take_along_axis(
                logp, toks[:, prefill_t][:, None], axis=-1
            )[:, 0]

            def body(i, carry):
                cache, nll = carry
                lg, cache, _ = m.apply(
                    p, jax.lax.dynamic_slice_in_dim(toks, i, 1, axis=1),
                    paged_cache=cache, deterministic=True,
                )
                logp = jax.nn.log_softmax(lg[:, 0].astype(jnp.float32))
                tgt = jax.lax.dynamic_slice_in_dim(toks, i + 1, 1, axis=1)
                nll += -jnp.take_along_axis(logp, tgt, axis=-1)[:, 0]
                return cache, nll

            _, nll = jax.lax.fori_loop(
                prefill_t, total_t - 1, body, (cache, nll0)
            )
            return jnp.exp(jnp.mean(nll / (total_t - prefill_t)))

        return float(jax.jit(run)(p))

    d_bf16 = decode_ppl(model, params, None)
    out["decode_ppl_bf16"] = round(d_bf16, 2)
    emit()
    d_int8kv = decode_ppl(model, params, "int8")
    out["decode_ppl_int8kv"] = round(d_int8kv, 2)
    out["decode_ppl_int8kv_delta_pct"] = round(
        100 * (d_int8kv / d_bf16 - 1), 3
    )
    emit()
    del params
    import gc

    gc.collect()
    d_int8w = decode_ppl(qmodel, qparams, None)
    out["decode_ppl_int8w"] = round(d_int8w, 2)
    emit()
    d_int8wkv = decode_ppl(qmodel, qparams, "int8")
    out["decode_ppl_int8w_kv"] = round(d_int8wkv, 2)
    out["decode_ppl_int8w_kv_delta_pct"] = round(
        100 * (d_int8wkv / d_bf16 - 1), 3
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
