#!/usr/bin/env python
"""Continuous-batching serving demo / load generator.

The serving-side counterpart of scripts/nlp/interactive_generation.py:
feed a stream of requests through ``vats_tpu.inference.ServingEngine``
(paged KV pool + page allocator + mid-flight admission/retirement) and
report latency/throughput per request.  With --ckpt it serves a trained
checkpoint; without, random weights at --config (load testing).

Example (load test, tiny tier, CPU):
    python scripts/nlp/serve.py --config xsmall --requests 8 --max-batch 4
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None, help="checkpoint dir (optional)")
    p.add_argument("--config", default="xsmall",
                   choices=["xsmall", "small", "medium", "large", "xlarge"])
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--max-context", type=int, default=512)
    p.add_argument("--page-size", type=int, default=128)
    p.add_argument("--total-pages", type=int, default=None)
    p.add_argument("--kv-quant", choices=["int8"], default=None)
    p.add_argument("--requests", type=int, default=8)
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (in-process; JAX_PLATFORMS "
                        "set after interpreter start is ignored here)")
    p.add_argument("--decode-block-steps", type=int, default=1,
                   help="decode steps per jitted block (amortizes the "
                        "per-step host sync; scheduler acts every k tokens)")
    p.add_argument("--spec-k", type=int, default=0,
                   help="speculative decoding: propose this many tokens per "
                        "step via prompt-lookup drafts (greedy only)")
    p.add_argument("--prefix-caching", action="store_true",
                   help="share full prompt pages across requests "
                        "(content-addressed, refcounted)")
    p.add_argument("--shared-prefix-len", type=int, default=0,
                   help="prepend this many identical tokens to every "
                        "prompt (models a common system prompt)")
    p.add_argument("--overlap-scheduling", action="store_true",
                   help="pipeline host scheduling behind device decode "
                        "blocks (dispatch block N+1 before fetching N)")
    p.add_argument("--per-request-sampling", action="store_true",
                   help="each request carries its own SamplingParams "
                        "(demo: alternating greedy / temperature+top-k "
                        "rows sharing one batch)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from vats_tpu import configs as cfgs
    from vats_tpu.inference import ServingEngine
    from vats_tpu.models import TextLM

    if args.ckpt:
        from vats_tpu.checkpoint import load_checkpoint
        from vats_tpu.configs import ModelArgs

        restored, meta = load_checkpoint(args.ckpt)
        model_args = ModelArgs.from_dict(meta["model_args"])
        params = (
            restored["params"] if isinstance(restored, dict)
            else restored.params
        )
        params = {"params": params}
    else:
        model_args = getattr(cfgs, f"nlp_{args.config}")(
            dropout=0.0, max_seq_len=args.max_context
        )
        import jax.numpy as jnp

        params = TextLM(model_args).init(
            jax.random.PRNGKey(args.seed), jnp.ones((1, 8), jnp.int32)
        )

    model = TextLM(model_args)
    eng = ServingEngine(
        model, params,
        max_batch=args.max_batch,
        max_context=args.max_context,
        page_size=args.page_size,
        total_pages=args.total_pages,
        kv_quant=args.kv_quant,
        do_sample=args.temperature > 0,
        temperature=args.temperature,
        seed=args.seed,
        decode_block_steps=args.decode_block_steps,
        prefix_caching=args.prefix_caching,
        spec_k=args.spec_k,
        per_request_sampling=args.per_request_sampling,
        overlap_scheduling=args.overlap_scheduling,
    )

    rng = np.random.default_rng(args.seed)
    shared = rng.integers(
        1, model_args.vocab_size, size=args.shared_prefix_len
    ).astype(int).tolist()
    submit_t: dict = {}
    for i in range(args.requests):
        plen = max(1, args.prompt_len + int(rng.integers(-8, 9)))
        prompt = shared + rng.integers(
            1, model_args.vocab_size, size=plen
        ).astype(int).tolist()
        sampling = None
        if args.per_request_sampling:
            from vats_tpu.inference.serving import SamplingParams

            sampling = (
                SamplingParams(temperature=0.0) if i % 2 == 0
                else SamplingParams(
                    temperature=max(args.temperature, 0.8), top_k=50, seed=i
                )
            )
        rid = eng.submit(
            prompt, max_new_tokens=args.max_new_tokens, sampling=sampling
        )
        submit_t[rid] = time.perf_counter()

    t0 = time.perf_counter()
    done_t: dict = {}
    results: dict = {}
    while eng.queue or any(r is not None for r in eng.row_request):
        for req in eng.step():
            results[req.rid] = req.output_ids
            done_t[req.rid] = time.perf_counter()
    wall = time.perf_counter() - t0

    total_tokens = sum(len(v) for v in results.values())
    lat = [done_t[r] - submit_t[r] for r in results]
    print(
        f"served {len(results)} requests, {total_tokens} tokens in "
        f"{wall:.2f}s -> {total_tokens / wall:.1f} tok/s | "
        f"latency p50 {np.percentile(lat, 50):.2f}s "
        f"p99 {np.percentile(lat, 99):.2f}s | "
        f"page high-water {eng.allocator.high_water}/"
        f"{eng.allocator.capacity}, preemptions {eng.preemptions}"
        + (
            f" | prefix-cache hit {eng.prefix_cache.hit_tokens}/"
            f"{eng.prefix_cache.query_tokens} prompt tokens"
            if eng.prefix_cache is not None else ""
        )
        + (
            f" | spec accept {eng.spec_accepted}/{eng.spec_proposed}"
            if eng.spec_k else ""
        )
    )


if __name__ == "__main__":
    main()
