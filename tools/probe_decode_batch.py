#!/usr/bin/env python
"""Probe: headline decode throughput vs batch size.

The decode step is dominated by the expert weight stream (10.7 ms/step at
the roof — trace-verified), which amortizes linearly over rows: if B=192 or
256 fits HBM at bf16, throughput scales almost proportionally.  Round 4
fixed B=128 ("largest that fits") — re-test after the round-5 page-pool and
sampling changes.

One subprocess per batch size (remote-HBM freeing between in-process runs
is unreliable).  Env: PROBE_STEPS (128), PROBE_PROMPT (128).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def worker():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(os.path.dirname(HERE), ".jax_cache")
    )
    from vats_tpu.configs import nlp_medium
    from vats_tpu.inference.generate import generate_paged
    from vats_tpu.models import TextLM

    batch = int(os.environ["PROBE_B"])
    steps = int(os.environ.get("PROBE_STEPS", "128"))
    prompt_len = int(os.environ.get("PROBE_PROMPT", "128"))
    total_len = prompt_len + steps
    cfg = nlp_medium(
        dropout=0.0, num_experts=8, top_k=2, param_dtype="bfloat16",
        capacity_factor=1.25, gradient_checkpointing=False,
        max_seq_len=total_len, left_window=-1, use_mqa=False,
    )
    model = TextLM(cfg)
    rng = jax.random.PRNGKey(0)
    prompt = jax.random.randint(rng, (batch, prompt_len), 1, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), prompt[:1, :8])

    rc = os.environ.get("PROBE_ROW_CHUNK")
    kv_quant = None
    if os.environ.get("PROBE_INT8") == "1":
        from vats_tpu.inference.quantize import QuantizedModel, quantize_params

        params = quantize_params(params)
        model = QuantizedModel(model)
        kv_quant = "int8"

    def run(seed):
        return generate_paged(
            model, params, prompt, None, jax.random.PRNGKey(seed),
            do_sample=True, temperature=0.8, top_k=50, page_size=128,
            max_new_tokens=steps, pad_token_id=0, eos_token_id=None,
            total_len=total_len, kv_quant=kv_quant,
            prefill_row_chunk=int(rc) if rc else None,
        )

    jax.device_get(run(0)[0])
    n = 2
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        jax.device_get(run(i)[0])
    dt = time.perf_counter() - t0
    print(json.dumps({"toks_per_sec": round(batch * steps * n / dt, 1)}),
          flush=True)


def main():
    if os.environ.get("PROBE_B"):
        worker()
        return
    out = {}
    for b in (128, 192, 256):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, PROBE_B=str(b)),
            capture_output=True, text=True, timeout=1200,
        )
        got = None
        for line in reversed((r.stdout or "").strip().splitlines()):
            try:
                got = json.loads(line)["toks_per_sec"]
                break
            except Exception:  # noqa: BLE001
                continue
        out[f"b{b}"] = got if got is not None else (r.stderr or "")[-300:]
        print(json.dumps({f"b{b}": out[f"b{b}"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
