#!/usr/bin/env python
"""Benchmark: MoE decoder LM decode throughput at the reference-medium tier.

Headline metric from BASELINE.json: MoE decode tokens/sec/chip, measured at
the reference's medium model shapes (d1440 / 24 heads / 8 kv groups / 20
layers / vocab 65536, /root/reference/configs/transformers/nlp/model_args/
model_args_medium.py) with the E=8 top-2 MoE the north star benchmarks —
4.19B params in bf16, the largest MoE tier that fits one v5e's 16 GB HBM
with a serving KV cache.  B=256 is the round-5 operating point (the
expert weight stream amortizes over rows; page-granular prefill appends
plus row-chunked prefill freed the HBM that capped round 4 at B=128).

The recorded serving path is ``generate_paged`` — ragged continuous-batching
decode through the Pallas paged-KV decode kernel — with EXACT top-k
sampling.  Secondary stages add the dense-cache path, greedy decode, int8
weight/KV modes, 32k SWA ring decode, flash-kernel deltas (fwd AND bwd),
the 3D-ViT metric, the continuous-batching serving engine, and training
throughput (dense + MoE tiers).

Driver-safety structure (round-3/4 post-mortems: rc=124 twice — round 3
printed nothing until the end; round 4 finished its internal budget but
the DRIVER's harder timeout killed it and the multi-KB final line was
truncated mid-JSON by the tail capture):
  * a COMPLETE minimal JSON line is printed immediately after the headline
    measurement; every later stage re-prints an enriched line (the driver
    parses the LAST line, so partial progress is always recorded)
  * every emitted line is COMPACT (<2 KB): numbers only.  Config strings,
    shape descriptions and sub-record verbosity live in BENCH_DETAIL.json
    (written next to this file on every stage boundary).
  * a global wall-clock budget (env BENCH_BUDGET_S, default 1350 s —
    sized to finish with >=40% margin under the driver's ~2400 s kill)
    skips remaining stages once exhausted — slow compiles degrade the
    record to "fewer secondaries", never to null
  * subprocess stages are capped at min(300 s, remaining budget) and their
    partial output FILE is parsed even on timeout.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
reference implementation's own cached decode (torch) run on this host's CPU
at identical shapes — calibrated via tools/calibrate_baseline_medium.py.
"""

import json
import math
import os
import subprocess
import sys
import time

BATCH = 352  # largest serving batch that fits paged bf16 at this tier
# (round 5: was 128 — the expert weight stream dominates the step and
# amortizes over rows.  Larger batches fit once (a) prefill appends write
# page-granular [no transposed-pool scatter temps] and (b) prefill runs
# in row chunks.  tools/probe_decode_batch.py on the chip: B=256 -> 9,041
# tok/s, B=320 -> 9,935, B=352 -> 10,358; B=384 misses HBM by ~40 MB.
PREFILL_ROW_CHUNK = 176
PROMPT_LEN = 128
DECODE_STEPS = 256
PAGE_SIZE = 128
N_ITERS = 3

# v5e peak: 197 bf16 TFLOP/s, 819 GB/s HBM (public TPU v5e spec)
PEAK_FLOPS = 197e12
PEAK_HBM_BPS = 819e9

_HERE = os.path.dirname(os.path.abspath(__file__))
_CALIB_FILE = os.path.join(_HERE, "tools", "baseline_calibration_medium.json")

T0 = time.monotonic()
# The budget orders stages most-important-first and every stage boundary
# re-emits the full record, so a harder external timeout still captures
# everything emitted up to the kill (round 3's all-or-nothing print is
# what produced an empty record; round 4's 2400 s internal budget exceeded
# the driver's own kill).
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1350"))

RESULTS = {
    "metric": "moe_decode_tokens_per_sec_per_chip",
    "value": None,
    "unit": "tokens/s/chip",
    "vs_baseline": None,
    "secondary": {},
}

# Verbose companion record (config strings, shape descriptions, full
# sub-bench records).  Written to BENCH_DETAIL.json — NOT printed — so the
# stdout lines the driver tails stay short.
DETAIL = {}


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def _compact(obj, path):
    """Recursively split ``obj``: numeric/bool leaves stay in the returned
    copy, string leaves move into DETAIL under ``path``."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            r = _compact(v, f"{path}.{k}")
            if r is not None:
                out[k] = r
        return out or None
    if isinstance(obj, str):
        d = DETAIL
        keys = path.split(".")
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = obj
        return None
    return obj


def emit() -> None:
    """Print the compact JSON record (the driver parses the LAST line
    printed, so every stage boundary re-emits the current state) and dump
    the verbose companion to BENCH_DETAIL.json."""
    try:
        with open(os.path.join(_HERE, "BENCH_DETAIL.json"), "w") as f:
            json.dump(DETAIL, f, indent=1, sort_keys=True)
    except Exception:  # noqa: BLE001
        pass
    line = json.dumps(RESULTS)
    if len(line) > 2000:  # hard guarantee: never emit a multi-KB line
        slim = {k: v for k, v in RESULTS.items() if k != "secondary"}
        slim["secondary_in"] = "BENCH_DETAIL.json"
        DETAIL["overflow_secondary"] = RESULTS["secondary"]
        line = json.dumps(slim)
    print(line, flush=True)


def run_stage(name: str, fn, min_s: float = 45.0) -> None:
    """Run one bench stage; record errors / budget skips instead of dying."""
    if remaining() < min_s:
        RESULTS.setdefault("skipped_stages", []).append(name)
        emit()
        return
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — a stage must never kill the record
        RESULTS.setdefault("stage_errors", {})[name] = repr(e)[:200]
    emit()


def _decode_flops_per_token(cfg, avg_ctx):
    """Active (routed) FLOPs per decoded token."""
    d, hd, g = cfg.d_model, cfg.head_dim, cfg.query_groups
    qkv = 2 * d * (d + 2 * g * hd)
    out = 2 * d * d
    attn = 4 * cfg.num_heads * hd * avg_ctx  # qk^T + pv
    moe = cfg.top_k * 3 * 2 * d * cfg.d_ffn + 2 * d * cfg.num_experts
    readout = 2 * d * cfg.vocab_size
    return cfg.num_layers * (qkv + out + attn + moe) + readout


def _decode_bytes_per_step(cfg, n_params, batch, avg_ctx, param_bytes=2):
    """HBM traffic per decode step: full weight stream (all experts are hit
    at this batch x top-2) + KV cache read + KV append + logits."""
    weights = n_params * param_bytes
    kv_read = batch * avg_ctx * cfg.num_layers * 2 * cfg.query_groups * cfg.head_dim * 2
    kv_write = batch * cfg.num_layers * 2 * cfg.query_groups * cfg.head_dim * 2
    logits = batch * cfg.vocab_size * 4
    return weights + kv_read + kv_write + logits


def _sub_json(argv, env_extra, timeout_s):
    """Run a subprocess bench and parse the LAST JSON line it printed.

    stdout goes to a TEMP FILE, not a pipe: when the timeout fires the
    file holds everything the child flushed, so a partially-finished
    bench still contributes its cumulative JSON line (pipe-based capture
    proved lossy on timeout)."""
    import tempfile

    with tempfile.NamedTemporaryFile("w+", suffix=".out") as fout, \
            tempfile.NamedTemporaryFile("w+", suffix=".err") as ferr:
        try:
            env = dict(os.environ, **env_extra)
            subprocess.run(
                argv, stdout=fout, stderr=ferr, timeout=timeout_s,
                env=env, cwd=_HERE,
            )
        except subprocess.TimeoutExpired:
            print(f"{argv[-1]}: timeout after {timeout_s}s "
                  f"(parsing partial output file)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{argv[-1]} failed: {e}", file=sys.stderr)
        fout.seek(0)
        lines = fout.read().strip().splitlines()
        if not any(ln.strip().startswith("{") for ln in lines):
            ferr.seek(0)
            print(f"{argv[-1]}: no JSON (stderr tail: "
                  f"{ferr.read()[-300:]})", file=sys.stderr)
        for line in reversed(lines):
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except Exception:  # noqa: BLE001
                    continue
    return None


def main():
    import jax
    import jax.numpy as jnp

    smoke = os.environ.get("BENCH_SMOKE", "") == "1"
    # CPU smoke must not share the TPU relay's compile cache: CPU AOT entries
    # bake host machine features (SIGILL risk across hosts)
    cache_dir = os.path.join(_HERE, ".jax_cache_cpu" if smoke else ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    sys.path.insert(0, _HERE)
    from vats_tpu.configs import nlp_medium
    from vats_tpu.inference.generate import generate, generate_paged
    from vats_tpu.models import TextLM
    from vats_tpu.nn.attention import select_attention_impl

    if smoke:
        # the container's sitecustomize pins the TPU relay backend at
        # interpreter start; smoke mode runs tiny shapes on host CPU
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"

    if smoke:
        cfg = nlp_medium(
            d_model=96, num_heads=4, query_groups=2, d_ffn=256, num_layers=2,
            vocab_size=512, dropout=0.0, num_experts=4, top_k=2,
            param_dtype="bfloat16", capacity_factor=1.25,
            gradient_checkpointing=False, max_seq_len=64, left_window=-1,
            use_mqa=False,
        )
        batch, prompt_len, decode_steps = 2, 8, 8
    else:
        # Pallas kernels must be on the recorded path (VERDICT round 1).
        assert on_tpu, "bench.py must run on TPU (set BENCH_SMOKE=1 for CPU smoke)"
        cfg = nlp_medium(
            dropout=0.0, num_experts=8, top_k=2, param_dtype="bfloat16",
            capacity_factor=1.25, gradient_checkpointing=False,
            max_seq_len=PROMPT_LEN + DECODE_STEPS, left_window=-1,
            use_mqa=False,
        )
        batch, prompt_len, decode_steps = BATCH, PROMPT_LEN, DECODE_STEPS
        assert select_attention_impl("auto", head_dim=cfg.head_dim) == "flash", (
            "flash kernel not selected for prefill at head_dim "
            f"{cfg.head_dim}"
        )

    model = TextLM(cfg)
    rng = jax.random.PRNGKey(0)
    prompt = jax.random.randint(rng, (batch, prompt_len), 1, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), prompt[:1, :8])
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    total_len = prompt_len + decode_steps
    common = dict(
        max_new_tokens=decode_steps,
        pad_token_id=0,
        eos_token_id=None,
        total_len=total_len,
    )

    def timed(fn):
        # warmup / compile (device_get, not block_until_ready: the axon
        # backend's block_until_ready can return before remote execution ends)
        out = fn(0)
        jax.device_get(out[0])
        t0 = time.perf_counter()
        for i in range(1, N_ITERS + 1):
            out = fn(i)
            jax.device_get(out[0])
        dt = time.perf_counter() - t0
        return batch * decode_steps * N_ITERS / dt

    sec = RESULTS["secondary"]

    # ---------------- stage: HEADLINE (paged bf16, exact top-k) ----------------
    row_chunk = None if smoke else PREFILL_ROW_CHUNK

    def run_paged(seed):
        return generate_paged(
            model, params, prompt, None, jax.random.PRNGKey(seed),
            do_sample=True, temperature=0.8, top_k=50,
            page_size=PAGE_SIZE, prefill_row_chunk=row_chunk,
            **common,
        )

    paged_tps = timed(run_paged)

    avg_ctx = prompt_len + decode_steps / 2
    step_s = batch / paged_tps
    flops_tok = _decode_flops_per_token(cfg, avg_ctx)
    bytes_step = _decode_bytes_per_step(cfg, n_params, batch, avg_ctx)

    baseline = None
    calib = {}
    if os.path.exists(_CALIB_FILE):
        try:
            with open(_CALIB_FILE) as f:
                calib = json.load(f)
        except Exception:  # noqa: BLE001
            calib = {}
    if not smoke:
        baseline = calib.get("reference_cpu_decode_toks_per_sec")

    DETAIL["config"] = (
        ("CPU SMOKE (tiny shapes) — " if smoke else "")
        + f"d{cfg.d_model}/{cfg.num_heads}h/{cfg.query_groups}g/"
        f"{cfg.num_layers}L vocab{cfg.vocab_size} "
        f"E{cfg.num_experts}top{cfg.top_k} "
        f"({n_params / 1e9:.2f}B params bf16), B={batch}, "
        f"prompt {prompt_len}, {decode_steps} decode steps, paged KV "
        f"(Pallas decode kernel, page_size={PAGE_SIZE}), "
        "exact top-k=50 sampling"
    )
    RESULTS.update({
        "value": round(paged_tps, 2),
        "vs_baseline": (
            round(paged_tps / baseline, 2) if baseline else None
        ),
        "params_b": round(n_params / 1e9, 3),
        "hbm_bw_utilization": round(bytes_step / step_s / PEAK_HBM_BPS, 3),
        "model_flops_utilization": round(paged_tps * flops_tok / PEAK_FLOPS, 4),
    })
    emit()  # the record now exists whatever happens below

    # ---------------- stage: dense cache (exact top-k) ----------------
    # (greedy-dense and int8-KV-only variants were dropped in round 5:
    # they duplicated what the headline + combined-int8 stages already
    # show, and the round-4 record died to the driver's timeout)
    def stage_dense():
        # the dense cache is [L, B, max_T, G, hd] — 12.9 GB at B=256, so
        # this stage runs at its own largest-fitting batch (128)
        dense_b = min(batch, 128)
        dense_prompt = prompt[:dense_b]

        def run_dense(seed):
            return generate(
                model, params, dense_prompt, None, jax.random.PRNGKey(seed),
                do_sample=True, temperature=0.8, top_k=50, **common,
            )

        out = run_dense(0)
        jax.device_get(out[0])
        t0 = time.perf_counter()
        for i in range(1, N_ITERS + 1):
            out = run_dense(i)
            jax.device_get(out[0])
        sec["dense_cache_exact_topk_toks_per_sec"] = round(
            dense_b * decode_steps * N_ITERS / (time.perf_counter() - t0), 2
        )
        sec["dense_cache_batch"] = dense_b

    run_stage("dense", stage_dense)

    # ---------------- stage: 32k-context SWA ring decode ----------------
    def stage_ring32k():
        if not on_tpu or smoke:
            return
        from vats_tpu.nn.kv_cache import ring_slots_for_window

        ring_cfg = nlp_medium(
            dropout=0.0, num_experts=8, top_k=2, param_dtype="bfloat16",
            capacity_factor=1.25, gradient_checkpointing=False,
            max_seq_len=32768, left_window=1024, use_mqa=False,
        )
        ring_model = TextLM(ring_cfg)
        slots = ring_slots_for_window(1024)
        n_ring_steps = 32
        ring_b = min(batch, 128)  # ring cache is 5.7 GB at B=128

        def ring_many(p):
            c = ring_model.init_cache(ring_b, slots, ring=True)
            c = c.replace(length=jnp.int32(32768 - n_ring_steps - 1))

            def body(i, carry):
                c, acc = carry
                tok_i = jnp.full((ring_b, 1), i % 1000 + 1, jnp.int32)
                logits, c2, _ = ring_model.apply(p, tok_i, cache=c)
                return (c2, acc + jnp.sum(logits.astype(jnp.float32)))

            c2, acc = jax.lax.fori_loop(
                0, n_ring_steps, body, (c, jnp.zeros((), jnp.float32))
            )
            return acc, c2.length

        ring_step = jax.jit(ring_many)
        jax.device_get(ring_step(params)[0])  # compile + warm
        t0 = time.perf_counter()
        jax.device_get(ring_step(params)[0])
        ctx32k_tps = ring_b * n_ring_steps / (time.perf_counter() - t0)
        sec["ctx32k_swa_ring_toks_per_sec"] = round(ctx32k_tps, 2)

    run_stage("ring32k", stage_ring32k)

    # ---------------- stage: weight-only int8 serving modes ----------------
    # (frees the bf16 tree: 8.4 GB + 4.2 GB don't co-fit on one v5e)
    import gc

    state = {"params": params, "qparams": None, "qmodel": None}
    del params

    def stage_int8w():
        from vats_tpu.inference.quantize import QuantizedModel, quantize_params

        state["qparams"] = quantize_params(state["params"])
        state["qmodel"] = QuantizedModel(model)
        state["params"] = None
        gc.collect()
        jax.clear_caches()
        qmodel, qparams = state["qmodel"], state["qparams"]

        def run_paged_int8(seed):
            return generate_paged(
                qmodel, qparams, prompt, None, jax.random.PRNGKey(seed),
                do_sample=True, temperature=0.8, top_k=50,
                page_size=PAGE_SIZE, prefill_row_chunk=row_chunk, **common,
            )

        sec["int8_paged_toks_per_sec"] = round(timed(run_paged_int8), 2)
        emit()

        # int8 weights AND int8 KV pages: minimum-HBM-traffic config
        def run_paged_int8_wkv(seed):
            return generate_paged(
                qmodel, qparams, prompt, None, jax.random.PRNGKey(seed),
                do_sample=True, temperature=0.8, top_k=50,
                page_size=PAGE_SIZE, kv_quant="int8",
                prefill_row_chunk=row_chunk, **common,
            )

        sec["int8_w_kv_paged_toks_per_sec"] = round(
            timed(run_paged_int8_wkv), 2
        )
        emit()

        # the freed bytes double the servable batch: B=2x
        if on_tpu and not smoke and remaining() > 90:
            big_batch = 2 * batch
            big_prompt = jax.random.randint(
                jax.random.PRNGKey(7), (big_batch, prompt_len), 1,
                cfg.vocab_size,
            )

            def run_b256(seed):
                return generate_paged(
                    qmodel, qparams, big_prompt, None, jax.random.PRNGKey(seed),
                    do_sample=True, temperature=0.8, top_k=50,
                    page_size=PAGE_SIZE, kv_quant="int8",
                    prefill_row_chunk=row_chunk, **common,
                )

            out = run_b256(0)
            jax.device_get(out[0])
            t0 = time.perf_counter()
            for i in range(1, N_ITERS + 1):
                out = run_b256(i)
                jax.device_get(out[0])
            sec[f"int8_w_kv_paged_b{big_batch}_toks_per_sec"] = round(
                big_batch * decode_steps * N_ITERS / (time.perf_counter() - t0),
                2,
            )

    run_stage("int8_weights", stage_int8w, min_s=120)

    # free the LM weights before the kernel/ViT/subprocess stages (one v5e)
    state.clear()
    gc.collect()
    jax.clear_caches()

    # ---------------- stage: flash-vs-XLA kernel deltas (fwd + bwd) --------
    def stage_kernels():
        if not on_tpu or smoke:
            return
        from vats_tpu.ops.attention_xla import dot_product_attention
        from vats_tpu.ops.flash_attention import flash_attention

        bk, sk = 4, 4096
        hq, g, hd = cfg.num_heads, cfg.query_groups, cfg.head_dim
        kq = jax.random.normal(jax.random.PRNGKey(2), (bk, sk, hq, hd), jnp.bfloat16)
        kk = jax.random.normal(jax.random.PRNGKey(3), (bk, sk, g, hd), jnp.bfloat16)
        kv = jax.random.normal(jax.random.PRNGKey(4), (bk, sk, g, hd), jnp.bfloat16)
        scale = 1.0 / math.sqrt(hd)

        def timed_loop(f, n=10):
            # n calls inside ONE jitted fori_loop (q perturbed per
            # iteration so XLA cannot hoist the body): per-dispatch timing
            # through the remote-TPU relay is noise-dominated at ~10 ms
            # ops — the same delta measured 0.68x and 1.17x across runs
            @jax.jit
            def run(q, k, v):
                def body(i, acc):
                    qi = q * (1.0 + i.astype(q.dtype) * 1e-6)
                    out = f(qi, k, v)
                    leaf = out[0] if isinstance(out, tuple) else out
                    return acc + jnp.sum(leaf.astype(jnp.float32))

                return jax.lax.fori_loop(
                    0, n, body, jnp.zeros((), jnp.float32)
                )

            jax.device_get(run(kq, kk, kv))
            t0 = time.perf_counter()
            jax.device_get(run(kq, kk, kv))
            return (time.perf_counter() - t0) / n

        def speedup(window):
            t_flash = timed_loop(lambda q, k, v: flash_attention(
                q, k, v, scale=scale, causal=True, left_window=window))
            t_xla = timed_loop(lambda q, k, v: dot_product_attention(
                q, k, v, scale=scale, causal=True, left_window=window))
            return round(t_xla / t_flash, 2)

        RESULTS["flash_vs_xla_prefill_speedup"] = speedup(-1)
        sec["flash_vs_xla_swa1024_speedup"] = speedup(1024)
        emit()

        # fwd+bwd at a training shape (the custom VJP path)
        def grad_of(attn_fn):
            def f(q, k, v):
                return jnp.sum(attn_fn(q, k, v).astype(jnp.float32))
            return jax.grad(f, argnums=(0, 1, 2))

        g_flash = grad_of(lambda q, k, v: flash_attention(
            q, k, v, scale=scale, causal=True, left_window=-1))
        g_xla = grad_of(lambda q, k, v: dot_product_attention(
            q, k, v, scale=scale, causal=True, left_window=-1))
        sec["flash_vs_xla_fwdbwd_speedup"] = round(
            timed_loop(g_xla, n=5) / timed_loop(g_flash, n=5), 2
        )

    run_stage("kernels", stage_kernels, min_s=90)

    # ---------------- stage: 3D-ViT xsmall forward (BASELINE metric #2) ----
    def stage_vit3d():
        from vats_tpu.configs.vit3d import vit3d_xsmall
        from vats_tpu.models.vit3d import VideoTransformer

        vcfg = vit3d_xsmall(dropout=0.0, use_checkpointing=False)
        if smoke:
            vcfg = vit3d_xsmall(
                dropout=0.0, use_checkpointing=False, d_model=48, num_heads=2,
                num_layers=2, max_frames=4, target_size=(32, 32),
            )
        vmodel = VideoTransformer(vcfg)
        th, tw = vcfg.target_size
        vb = 2 if smoke else 4
        vx = jax.random.normal(
            jax.random.PRNGKey(5), (vb, vcfg.C_in, vcfg.max_frames, th, tw),
            jnp.bfloat16,
        )
        vparams = vmodel.init(jax.random.PRNGKey(6), vx)
        vparams = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            vparams,
        )
        n_vit = 2 if smoke else 10

        # in-graph loop: per-dispatch timing through the remote-TPU relay
        # is noise-dominated at this op size (see tools/bench_vit3d.py)
        @jax.jit
        def vfwd_loop(p, xx):
            def body(i, acc):
                xi = xx * (1.0 + i.astype(xx.dtype) * 1e-6)
                return acc + jnp.sum(vmodel.apply(p, xi).astype(jnp.float32))

            return jax.lax.fori_loop(
                0, n_vit, body, jnp.zeros((), jnp.float32)
            )

        jax.device_get(vfwd_loop(vparams, vx))
        t0 = time.perf_counter()
        jax.device_get(vfwd_loop(vparams, vx))
        fps = vb * vcfg.max_frames * n_vit / (time.perf_counter() - t0)
        RESULTS["vit3d_frames_per_sec"] = round(fps, 1)
        ref_fps = calib.get("reference_cpu_vit3d_xsmall_frames_per_sec")
        if ref_fps and not smoke:
            RESULTS["vit3d_vs_baseline"] = round(fps / ref_fps, 2)

    run_stage("vit3d_xsmall", stage_vit3d, min_s=60)

    # ---------------- stage: 2D-ViT medium forward (image encoder) --------
    def stage_vit2d():
        """Image-encoder throughput at the reference medium tier
        (384px/p16/d1152, /root/reference/configs/transformers/vision/
        vit_2d/model_args/model_args_medium.py) — the one BASELINE workload
        that had no on-chip number through round 4."""
        from vats_tpu.configs.vit2d import vit2d_medium, vit2d_xsmall
        from vats_tpu.models.vit2d import ImageEncoder

        if smoke:
            icfg = vit2d_xsmall(dropout=0.0)
            ib = 2
        else:
            icfg = vit2d_medium(dropout=0.0, use_checkpointing=False)
            ib = 16
        imodel = ImageEncoder(icfg)
        ix = jax.random.normal(
            jax.random.PRNGKey(8),
            (ib, icfg.C_in, icfg.target_size, icfg.target_size),
            jnp.bfloat16,
        )
        iparams = imodel.init(jax.random.PRNGKey(9), ix)
        iparams = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            iparams,
        )
        n_img = 2 if smoke else 10

        @jax.jit
        def ifwd_loop(p, xx):
            def body(i, acc):
                xi = xx * (1.0 + i.astype(xx.dtype) * 1e-6)
                return acc + jnp.sum(imodel.apply(p, xi).astype(jnp.float32))

            return jax.lax.fori_loop(
                0, n_img, body, jnp.zeros((), jnp.float32)
            )

        jax.device_get(ifwd_loop(iparams, ix))
        t0 = time.perf_counter()
        jax.device_get(ifwd_loop(iparams, ix))
        ips = ib * n_img / (time.perf_counter() - t0)
        RESULTS["vit2d_images_per_sec"] = round(ips, 1)
        DETAIL["vit2d_config"] = (
            f"vit2d_medium {icfg.target_size}px/p{icfg.patch_size}/"
            f"d{icfg.d_model}/{icfg.num_layers}L, B={ib}, bf16"
        )
        ref_ips = calib.get("reference_cpu_vit2d_medium_images_per_sec")
        if ref_ips and not smoke:
            RESULTS["vit2d_vs_baseline"] = round(ips / ref_ips, 2)

    run_stage("vit2d_medium", stage_vit2d, min_s=60)

    # ---------------- subprocess stages (each needs ~all of HBM) ----------
    def sub_timeout():
        return max(60, min(300, remaining() - 30))

    def stage_serving():
        if not on_tpu or smoke:
            return
        t = max(60, min(420, remaining() - 30))
        sj = _sub_json(
            [sys.executable, os.path.join(_HERE, "tools", "bench_serving.py")],
            {"BENCH_SERVING_BUDGET_S": str(int(t - 20))},
            timeout_s=t,
        )
        if sj:
            sec["serving_engine"] = _compact(sj, "secondary.serving_engine")


    def stage_train():
        if not on_tpu or smoke:
            return
        tj = _sub_json(
            [sys.executable, os.path.join(_HERE, "tools", "bench_train.py")],
            {"BENCH_TRAIN_TIER": "medium_dense"},
            timeout_s=sub_timeout(),
        )
        if tj:
            sec["train"] = _compact({
                "tokens_per_sec": tj.get("value"),
                "mfu": tj.get("train_mfu"),
                "config": tj.get("config"),
            }, "secondary.train")

    run_stage("train_dense", stage_train, min_s=150)

    def stage_train_moe():
        if not on_tpu or smoke:
            return
        tj = _sub_json(
            [sys.executable, os.path.join(_HERE, "tools", "bench_train.py")],
            {"BENCH_TRAIN_TIER": "medium_moe"},
            timeout_s=sub_timeout(),
        )
        if tj:
            sec["train_moe"] = _compact({
                "tokens_per_sec": tj.get("value"),
                "mfu": tj.get("train_mfu"),
                "config": tj.get("config"),
            }, "secondary.train_moe")

    run_stage("train_moe", stage_train_moe, min_s=150)

    def stage_vit3d_large():
        if not on_tpu or smoke:
            return
        vj = _sub_json(
            [sys.executable, os.path.join(_HERE, "tools", "bench_vit3d.py")],
            {"BENCH_VIT3D_TIERS": "large"},
            timeout_s=sub_timeout(),
        )
        if vj:
            entry = {
                "frames_per_sec": vj.get("value"),
                "config": vj.get("config"),
            }
            ref_fps = calib.get("reference_cpu_vit3d_large_frames_per_sec")
            if ref_fps and vj.get("value"):
                entry["vs_baseline"] = round(vj["value"] / ref_fps, 2)
            sec["vit3d_large"] = _compact(entry, "secondary.vit3d_large")

    run_stage("vit3d_large", stage_vit3d_large, min_s=120)

    def stage_int8_quality():
        if not on_tpu or smoke:
            return
        qj = _sub_json(
            [sys.executable,
             os.path.join(_HERE, "tools", "bench_int8_quality.py")],
            {},
            timeout_s=sub_timeout(),
        )
        if qj:
            sec["int8_quality"] = _compact(qj, "secondary.int8_quality")

    run_stage("int8_quality", stage_int8_quality, min_s=120)

    def stage_trained_quality():
        """int8 deltas + spec-decode acceptance on TRAINED weights
        (tools/train_real_ckpt.py's byte-LM; skips if never trained)."""
        if not on_tpu or smoke:
            return
        if not os.path.isdir(os.path.join(
                _HERE, "checkpoints", "real_d512", "best_model")):
            return
        qj = _sub_json(
            [sys.executable,
             os.path.join(_HERE, "tools", "bench_trained_quality.py")],
            {},
            timeout_s=sub_timeout(),
        )
        if qj and "skipped" not in qj:
            sec["trained_quality"] = _compact(qj, "secondary.trained_quality")

    run_stage("trained_quality", stage_trained_quality, min_s=100)

    def stage_gen():
        """Image / video / fused-multimodal generation (BASELINE configs
        #4-5 — the reference's generation entry points are EMPTY files,
        /root/reference/src/autoregressive_*/.../generation/generate.py)."""
        if not on_tpu or smoke:
            return
        gj = _sub_json(
            [sys.executable, os.path.join(_HERE, "tools", "bench_gen.py")],
            {},
            timeout_s=sub_timeout(),
        )
        if gj:
            sec["generation"] = _compact(gj, "secondary.generation")

    run_stage("generation", stage_gen, min_s=120)

    # serving last: it is the longest subprocess (~450-700 s) with the
    # highest relay-latency variance, and its cumulative emission means a
    # budget expiry mid-run still records the completed scenarios
    run_stage("serving_engine", stage_serving, min_s=180)

    RESULTS["bench_wall_s"] = round(time.monotonic() - T0, 1)
    emit()


if __name__ == "__main__":
    main()
