#!/usr/bin/env python
"""Interactive generation CLI.

Counterpart of /root/reference/src/transformers/nlp/inference/
interactive_generation.py:13-108: load the best checkpoint (args restored
from checkpoint metadata), then prompt on stdin until 'quit'.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    from vats_tpu.utils.env import maybe_force_cpu

    maybe_force_cpu()
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="checkpoints/nlp/best_model")
    p.add_argument("--tokenizer", default="mistralai/Mistral-7B-v0.1")
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--paged", action="store_true",
                   help="serve through the paged-KV decode kernel")
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="weight-only int8 serving")
    p.add_argument("--kv-quant", choices=["int8"], default=None,
                   help="int8 paged KV pages (implies --paged)")
    args = p.parse_args()

    from transformers import AutoTokenizer

    from vats_tpu.checkpoint import load_checkpoint
    from vats_tpu.configs import GenerationArgs, ModelArgs
    from vats_tpu.inference import TokenGenerator

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    if tokenizer.pad_token_id is None:
        tokenizer.pad_token = tokenizer.eos_token

    restored, meta = load_checkpoint(args.ckpt)
    model_args = ModelArgs.from_dict(meta["model_args"])
    params = restored["params"] if isinstance(restored, dict) else restored.params
    gen = TokenGenerator(
        model_args, params={"params": params},
        use_paged=args.paged or args.kv_quant is not None,
        quantize=args.quantize, kv_quant=args.kv_quant,
    )
    gen_args = GenerationArgs(
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        pad_token_id=tokenizer.pad_token_id,
        eos_token_id=tokenizer.eos_token_id,
    )

    print("Interactive generation — type 'quit' to exit.")
    while True:
        try:
            prompt = input("> ")
        except (EOFError, KeyboardInterrupt):
            break
        if prompt.strip().lower() in ("quit", "exit"):
            break
        print(gen.generate_tokens(prompt, gen_args, tokenizer))


if __name__ == "__main__":
    main()
