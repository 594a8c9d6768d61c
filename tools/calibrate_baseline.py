#!/usr/bin/env python
"""One-time baseline calibration: time the REFERENCE implementation's cached
decode (torch, CPU) at bench.py's exact model shapes, and record
tokens/sec into tools/baseline_calibration.json for bench.py's vs_baseline.

The reference publishes no benchmark numbers (BASELINE.md), so its own
generation loop (/root/reference/src/transformers/nlp/inference/generate.py,
use_cache=True path) is the measurable baseline available in this container.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

import bench_shapes  # noqa: E402  (shared shape constants)


def main():
    from configs.transformers.nlp.model_args.model_args_xsmall import ModelArgs

    # construct without __post_init__ validation (the reference's own large
    # tiers violate its d_ffn rule; we need exact bench shapes)
    args = ModelArgs.__new__(ModelArgs)
    for k, v in dict(
        d_model=bench_shapes.BENCH_CFG["d_model"],
        num_heads=bench_shapes.BENCH_CFG["num_heads"],
        query_groups=bench_shapes.BENCH_CFG["query_groups"],
        d_ffn=bench_shapes.BENCH_CFG["d_ffn"],
        num_layers=bench_shapes.BENCH_CFG["num_layers"],
        dropout=0.0,
        rope_base=10000.0,
        rms_norm_eps=1e-7,
        left_window=512,
        right_window=0,
        vocab_size=bench_shapes.BENCH_CFG["vocab_size"],
        max_seq_len=bench_shapes.BENCH_CFG["max_seq_len"],
        tie_weights=True,
        max_batch_size=64,
        gradient_checkpointing=False,
        use_proj_bias=False,
        use_qkv_proj=True,
        use_causal=True,
        use_mqa=False,
        use_cache=True,
        num_experts=bench_shapes.BENCH_CFG["num_experts"],
        top_k=bench_shapes.BENCH_CFG["top_k"],
        softmax_scale=1.0
        / (bench_shapes.BENCH_CFG["d_model"] / bench_shapes.BENCH_CFG["num_heads"])
        ** 0.5,
    ).items():
        setattr(args, k, v)

    from src.transformers.nlp.inference.generate import AutoregressiveTokenGenerator

    torch.manual_seed(0)
    gen = AutoregressiveTokenGenerator(args)

    b = bench_shapes.BATCH
    prompt = torch.randint(1, args.vocab_size, (b, bench_shapes.PROMPT_LEN))

    # warmup
    gen._generate(
        prompt,
        max_new_tokens=8,
        temperature=0.8,
        top_k=50,
        do_sample=True,
        pad_token_id=0,
        eos_token_id=None,
        use_cache=True,
    )

    steps = bench_shapes.DECODE_STEPS
    t0 = time.perf_counter()
    out = gen._generate(
        prompt,
        max_new_tokens=steps,
        temperature=0.8,
        top_k=50,
        do_sample=True,
        pad_token_id=0,
        eos_token_id=None,
        use_cache=True,
    )
    dt = time.perf_counter() - t0
    n_generated = out.shape[1] - bench_shapes.PROMPT_LEN
    toks_per_sec = b * n_generated / dt

    result = {
        "reference_cpu_decode_toks_per_sec": round(toks_per_sec, 2),
        "shapes": bench_shapes.BENCH_CFG,
        "batch": b,
        "prompt_len": bench_shapes.PROMPT_LEN,
        "decode_steps": n_generated,
        "wall_time_s": round(dt, 2),
        "device": "cpu",
        "note": "reference torch generate.py use_cache=True path",
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baseline_calibration.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
