#!/usr/bin/env python
"""One-time baseline calibration at the ROUND-2 bench tier.

Times the REFERENCE implementation's cached decode (torch, CPU) at the
reference-medium MoE shapes bench.py now uses (d1440/24h/20L, vocab 65536,
E=8 top-2 — /root/reference/configs/transformers/nlp/model_args/
model_args_medium.py with the expert count bench.py benchmarks), and records
tokens/sec into tools/baseline_calibration_medium.json.

At 4.2B params fp32 on this host's single CPU core a full 256-step decode
would take hours, so this measures a short steady-state window (the cached
decode step cost is length-independent until the window fills) and reports
per-token throughput from it.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

BATCH = 64
PROMPT_LEN = 16
DECODE_STEPS = 8


def main():
    from configs.transformers.nlp.model_args.model_args_medium import ModelArgs

    args = ModelArgs(
        dropout=0.0,
        use_cache=True,
        max_seq_len=512,
        max_batch_size=BATCH,
        gradient_checkpointing=False,
        num_experts=8,
        top_k=2,
    )

    from src.transformers.nlp.inference.generate import AutoregressiveTokenGenerator

    torch.manual_seed(0)
    t0 = time.perf_counter()
    gen = AutoregressiveTokenGenerator(args)
    init_s = time.perf_counter() - t0
    print(json.dumps({"probe": "init", "init_s": round(init_s, 1)}), flush=True)

    prompt = torch.randint(1, args.vocab_size, (BATCH, PROMPT_LEN))

    # warmup (2 steps: prefill + one cached step)
    gen._generate(
        prompt, max_new_tokens=2, temperature=0.8, top_k=50, do_sample=True,
        pad_token_id=0, eos_token_id=None, use_cache=True,
    )

    t0 = time.perf_counter()
    out = gen._generate(
        prompt, max_new_tokens=DECODE_STEPS, temperature=0.8, top_k=50,
        do_sample=True, pad_token_id=0, eos_token_id=None, use_cache=True,
    )
    dt = time.perf_counter() - t0
    n_generated = out.shape[1] - PROMPT_LEN
    toks_per_sec = BATCH * n_generated / dt

    result = {
        "reference_cpu_decode_toks_per_sec": round(toks_per_sec, 2),
        "shapes": dict(
            d_model=1440, num_heads=24, query_groups=8, d_ffn=5760,
            num_layers=20, vocab_size=65536, num_experts=8, top_k=2,
        ),
        "batch": BATCH,
        "prompt_len": PROMPT_LEN,
        "decode_steps": int(n_generated),
        "wall_time_s": round(dt, 2),
        "device": "cpu",
        "note": (
            "reference torch generate.py use_cache=True path at the "
            "reference-medium MoE tier (short steady-state window; cached "
            "step cost is length-independent at these lengths)"
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "baseline_calibration_medium.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
