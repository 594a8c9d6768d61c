#!/usr/bin/env python
"""Benchmark: autoregressive image / video token generation throughput.

BASELINE configs #4-5 (on-device sampling with paged/temporal KV caches).
Prints one JSON line per stack.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.configs.image_gen import image_gen_xsmall
    from vats_tpu.configs.video_gen import video_gen_xsmall
    from vats_tpu.inference.image_generation import generate_image_tokens
    from vats_tpu.inference.video_generation import generate_video_tokens
    from vats_tpu.models.image_gen import AutoregressiveImageTransformer
    from vats_tpu.models.video_gen import AutoregressiveVideoTransformer

    results = []
    summary = {}
    _SHORT = {
        "image_gen_tokens_per_sec_per_chip": "image_gen_toks_per_sec",
        "video_gen_tokens_per_sec_per_chip": "video_gen_toks_per_sec",
        "multimodal_fused_paged_tokens_per_sec_per_chip":
            "multimodal_fused_toks_per_sec",
    }

    def record(r):
        """Print the stack's own line plus a CUMULATIVE summary line — the
        caller (bench.py) parses the last line, so a timeout mid-run still
        folds the completed stacks."""
        results.append(r)
        print(json.dumps(r), flush=True)
        key = _SHORT.get(r["metric"], r["metric"])
        summary[key] = r["value"]
        summary[key + "_config"] = r["config"]
        print(json.dumps(summary), flush=True)

    # --- image gen: reference xsmall tier (d768/12L), 16x16 latent grid ---
    b, gh, gw = 4, 16, 16
    cfg = image_gen_xsmall(dropout=0.0, use_checkpointing=False)
    model = AutoregressiveImageTransformer(cfg)
    text = jax.random.normal(jax.random.PRNGKey(0), (b, 16, cfg.d_model),
                             jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((b, gh, gw), jnp.int32),
        text,
    )

    def run_img(seed):
        return generate_image_tokens(
            model, params, text, None, jax.random.PRNGKey(seed),
            grid_h=gh, grid_w=gw, temperature=0.9, top_k=64, do_sample=True,
        )

    jax.device_get(run_img(0))
    t0 = time.perf_counter()
    for i in (1, 2):
        out = run_img(i)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / 2
    record({
        "metric": "image_gen_tokens_per_sec_per_chip",
        "value": round(b * gh * gw / dt, 2),
        "unit": "image tokens/s/chip",
        "config": "image_gen_xsmall (d768/12L), 16x16 latent grid, B=4",
        "vs_baseline": None,
    })

    # --- video gen: xsmall tier, 5 latent frames of 8x8 ---
    cfg_v = video_gen_xsmall(dropout=0.0, use_checkpointing=False)
    vmodel = AutoregressiveVideoTransformer(cfg_v)
    bv, frames = 2, 5
    text_v = jax.random.normal(jax.random.PRNGKey(2), (bv, 8, cfg_v.d_model),
                               jnp.bfloat16)
    vparams = vmodel.init(
        jax.random.PRNGKey(3),
        jnp.zeros((bv, 1, cfg_v.latent_height, cfg_v.latent_width), jnp.int32),
        text_v,
    )

    def run_vid(seed):
        return generate_video_tokens(
            vmodel, vparams, text_v, None, jax.random.PRNGKey(seed),
            num_frames=frames, temperature=0.9, top_k=64, do_sample=True,
        )

    jax.device_get(run_vid(0))
    t0 = time.perf_counter()
    out = run_vid(1)
    jax.device_get(out)
    dt = time.perf_counter() - t0
    n_tokens = bv * frames * cfg_v.latent_height * cfg_v.latent_width
    record({
        "metric": "video_gen_tokens_per_sec_per_chip",
        "value": round(n_tokens / dt, 2),
        "unit": "video tokens/s/chip",
        "config": "video_gen_xsmall (d144/4L), 5 frames of 8x8, B=2",
        "vs_baseline": None,
    })

    # --- fused text+image+video token stream over ONE paged KV cache ---
    # BASELINE config #5: the whole multimodal generation is a single jitted
    # program — ragged text prefill + 2304-step decode through the Pallas
    # paged decode kernel with per-step modality-masked sampling.
    from vats_tpu.configs.multimodal import multimodal_small
    from vats_tpu.inference.multimodal import generate_multimodal
    from vats_tpu.models.multimodal import MultimodalLM

    cfg_m = multimodal_small()
    mmodel = MultimodalLM(cfg_m)
    bm, t_text = 4, 64
    text_ids = jax.random.randint(
        jax.random.PRNGKey(4), (bm, t_text), 1, cfg_m.text_vocab_size
    )
    mparams = mmodel.init(
        jax.random.PRNGKey(5),
        text_ids[:, :8],
        jnp.zeros((bm, 8), jnp.int32),
        jnp.zeros((bm, 8), jnp.int32),
    )["params"]

    def run_mm(seed):
        return generate_multimodal(
            mmodel, mparams, text_ids, None, jax.random.PRNGKey(seed),
            temperature=0.9, top_k=64, do_sample=True, page_size=128,
        )

    jax.device_get(run_mm(0))
    t0 = time.perf_counter()
    out = run_mm(1)
    jax.device_get(out)
    dt = time.perf_counter() - t0
    n_tokens = bm * (cfg_m.image_tokens + cfg_m.video_tokens)
    record({
        "metric": "multimodal_fused_paged_tokens_per_sec_per_chip",
        "value": round(n_tokens / dt, 2),
        "unit": "image+video tokens/s/chip",
        "config": (
            "multimodal_small (d768/12L), fused text(64)+image(16x16)"
            "+video(8x16x16) stream, paged KV (page_size=128), B=4"
        ),
        "vs_baseline": None,
    })




if __name__ == "__main__":
    main()
