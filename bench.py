#!/usr/bin/env python
"""Benchmark: MoE decoder LM decode throughput at the reference-medium tier.

Headline metric from BASELINE.json: MoE decode tokens/sec/chip, measured at
the reference's medium model shapes (d1440 / 24 heads / 8 kv groups / 20
layers / vocab 65536, /root/reference/configs/transformers/nlp/model_args/
model_args_medium.py) with the E=8 top-2 MoE the north star benchmarks —
4.19B params in bf16, the largest MoE tier that fits one v5e's 16 GB HBM
with a serving KV cache.  B=128 is the operating point (fits since the
sequence-minor KV layouts removed the 128-lane head-dim pad).

The recorded serving path is ``generate_paged`` — ragged continuous-batching
decode through the Pallas paged-KV decode kernel — with EXACT top-k
sampling.  Secondary fields report the dense-cache path, greedy decode
(isolating sampling cost), a flash-vs-XLA prefill kernel delta on the chip,
the 3D-ViT forward metric (BASELINE metric #2), and the roofline position
(HBM bandwidth utilization + MFU).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
reference implementation's own cached decode (torch) run on this host's CPU
at identical shapes — calibrated via tools/calibrate_baseline_medium.py.

Prints exactly one JSON line.
"""

import json
import math
import os
import sys
import time

BATCH = 128  # largest serving batch that fits paged bf16 at this tier
PROMPT_LEN = 128
DECODE_STEPS = 256
PAGE_SIZE = 128
N_ITERS = 3

# v5e peak: 197 bf16 TFLOP/s, 819 GB/s HBM (public TPU v5e spec)
PEAK_FLOPS = 197e12
PEAK_HBM_BPS = 819e9

_CALIB_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "tools", "baseline_calibration_medium.json",
)


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
    at B=64 x top-2) + KV cache read + KV append + logits."""
    weights = n_params * param_bytes
    kv_read = batch * avg_ctx * cfg.num_layers * 2 * cfg.query_groups * cfg.head_dim * 2
    kv_write = batch * cfg.num_layers * 2 * cfg.query_groups * cfg.head_dim * 2
    logits = batch * cfg.vocab_size * 4
    return weights + kv_read + kv_write + logits


def main():
    import jax
    import jax.numpy as jnp

    smoke_env = os.environ.get("BENCH_SMOKE", "") == "1"
    # CPU smoke must not share the TPU relay's compile cache: CPU AOT entries
    # bake host machine features (SIGILL risk across hosts)
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".jax_cache_cpu" if smoke_env else ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vats_tpu.configs import nlp_medium
    from vats_tpu.inference.generate import generate, generate_paged
    from vats_tpu.models import TextLM
    from vats_tpu.nn.attention import select_attention_impl

    smoke = os.environ.get("BENCH_SMOKE", "") == "1"
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

    def run_paged(seed):
        # serving path: Pallas paged-KV decode kernel, exact top-k sampling
        return generate_paged(
            model, params, prompt, None, jax.random.PRNGKey(seed),
            do_sample=True, temperature=0.8, top_k=50,
            page_size=PAGE_SIZE, **common,
        )

    def run_dense(seed):
        return generate(
            model, params, prompt, None, jax.random.PRNGKey(seed),
            do_sample=True, temperature=0.8, top_k=50, **common,
        )

    def run_greedy(seed):
        return generate(
            model, params, prompt, None, jax.random.PRNGKey(seed),
            do_sample=False, temperature=0.0, top_k=None, **common,
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

    paged_tps = timed(run_paged)
    dense_tps = timed(run_dense)
    greedy_tps = timed(run_greedy)

    def run_paged_int8kv(seed):
        # int8 KV pages (bf16 weights): halves the per-step KV stream
        return generate_paged(
            model, params, prompt, None, jax.random.PRNGKey(seed),
            do_sample=True, temperature=0.8, top_k=50,
            page_size=PAGE_SIZE, kv_quant="int8", **common,
        )

    int8kv_paged_tps = timed(run_paged_int8kv)

    # --- 32k-context SWA decode through the ring cache (reference xlarge
    # tier's declared operating point: max_seq_len=32768, left_window<=1024)
    # — measured as an n-step jitted decode loop at depth, like
    # tools/probe_ctx_sweep.py ---
    ctx32k_tps = None
    if on_tpu and not smoke:
        from vats_tpu.nn.kv_cache import ring_slots_for_window

        ring_cfg = nlp_medium(
            dropout=0.0, num_experts=8, top_k=2, param_dtype="bfloat16",
            capacity_factor=1.25, gradient_checkpointing=False,
            max_seq_len=32768, left_window=1024, use_mqa=False,
        )
        ring_model = TextLM(ring_cfg)
        slots = ring_slots_for_window(1024)
        n_ring_steps = 32

        def ring_many(p):
            c = ring_model.init_cache(batch, slots, ring=True)
            c = c.replace(length=jnp.int32(32768 - n_ring_steps - 1))

            def body(i, carry):
                c, acc = carry
                tok_i = jnp.full((batch, 1), i % 1000 + 1, jnp.int32)
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
        ctx32k_tps = batch * n_ring_steps / (time.perf_counter() - t0)

    # --- weight-only int8 serving mode (secondary; the headline stays the
    # parity-faithful bf16 path) ---
    from vats_tpu.inference.quantize import QuantizedModel, quantize_params

    import gc

    qparams = quantize_params(params)
    qmodel = QuantizedModel(model)
    # free the bf16 tree before running (8.4 GB + 4.2 GB don't co-fit with
    # the serving caches on one v5e)
    del params
    gc.collect()
    jax.clear_caches()

    def run_paged_int8(seed):
        return generate_paged(
            qmodel, qparams, prompt, None, jax.random.PRNGKey(seed),
            do_sample=True, temperature=0.8, top_k=50,
            page_size=PAGE_SIZE, **common,
        )

    def run_dense_int8(seed):
        return generate(
            qmodel, qparams, prompt, None, jax.random.PRNGKey(seed),
            do_sample=True, temperature=0.8, top_k=50, **common,
        )

    int8_paged_tps = timed(run_paged_int8)
    int8_dense_tps = timed(run_dense_int8)

    # --- int8 weights AND int8 KV pages (the minimum-HBM-traffic config);
    # the freed bytes also double the servable batch: record B=2x ---
    def run_paged_int8_wkv(seed):
        return generate_paged(
            qmodel, qparams, prompt, None, jax.random.PRNGKey(seed),
            do_sample=True, temperature=0.8, top_k=50,
            page_size=PAGE_SIZE, kv_quant="int8", **common,
        )

    int8_wkv_paged_tps = timed(run_paged_int8_wkv)

    int8_wkv_b256_tps = None
    if on_tpu and not smoke:
        big_batch = 2 * batch
        big_prompt = jax.random.randint(
            jax.random.PRNGKey(7), (big_batch, prompt_len), 1, cfg.vocab_size
        )

        def run_b256(seed):
            return generate_paged(
                qmodel, qparams, big_prompt, None, jax.random.PRNGKey(seed),
                do_sample=True, temperature=0.8, top_k=50,
                page_size=PAGE_SIZE, kv_quant="int8", **common,
            )

        try:
            out = run_b256(0)
            jax.device_get(out[0])
            t0 = time.perf_counter()
            for i in range(1, N_ITERS + 1):
                out = run_b256(i)
                jax.device_get(out[0])
            int8_wkv_b256_tps = (
                big_batch * decode_steps * N_ITERS / (time.perf_counter() - t0)
            )
        except Exception as e:  # OOM etc. — record the miss, keep the bench
            print(f"B={big_batch} int8-W+KV serving failed: {e}",
                  file=sys.stderr)
        del big_prompt

    # free the LM weights before the kernel/ViT stages (one v5e)
    del qparams, prompt
    gc.collect()
    jax.clear_caches()

    # --- flash-vs-XLA prefill kernel delta on this chip ---
    kernel_speedup = None
    if on_tpu and not smoke:
        from vats_tpu.ops.attention_xla import dot_product_attention
        from vats_tpu.ops.flash_attention import flash_attention

        bk, sk = 4, 4096
        hq, g, hd = cfg.num_heads, cfg.query_groups, cfg.head_dim
        kq = jax.random.normal(jax.random.PRNGKey(2), (bk, sk, hq, hd), jnp.bfloat16)
        kk = jax.random.normal(jax.random.PRNGKey(3), (bk, sk, g, hd), jnp.bfloat16)
        kv = jax.random.normal(jax.random.PRNGKey(4), (bk, sk, g, hd), jnp.bfloat16)
        scale = 1.0 / math.sqrt(hd)

        f_flash = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, scale=scale, causal=True, left_window=cfg.left_window))
        f_xla = jax.jit(lambda q, k, v: dot_product_attention(
            q, k, v, scale=scale, causal=True, left_window=cfg.left_window))

        def timed_op(f):
            jax.device_get(f(kq, kk, kv))
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(kq, kk, kv)
            jax.device_get(out)
            return (time.perf_counter() - t0) / 10

        t_flash = timed_op(f_flash)
        t_xla = timed_op(f_xla)
        kernel_speedup = round(t_xla / t_flash, 2)

    # --- 3D-ViT forward (BASELINE metric #2) ---
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
    vfwd = jax.jit(lambda p, xx: vmodel.apply(p, xx))
    jax.device_get(vfwd(vparams, vx))
    n_vit = 2 if smoke else 10
    t0 = time.perf_counter()
    for _ in range(n_vit):
        vout = vfwd(vparams, vx)
    jax.device_get(vout)
    vit3d_fps = vb * vcfg.max_frames * n_vit / (time.perf_counter() - t0)

    # --- training MFU and ViT-3D-large tiers, in SUBPROCESSES: each needs
    # ~all of HBM to itself (0.88B train state / 1.3B ViT activations) and
    # must not co-reside with this process's live buffers ---
    import subprocess

    def _sub_json(argv, env_extra, timeout_s=2400):
        try:
            env = dict(os.environ, **env_extra)
            out = subprocess.run(
                argv, capture_output=True, text=True, timeout=timeout_s,
                env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in reversed(out.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
            print(f"{argv[-1]}: no JSON (stderr tail: "
                  f"{out.stderr[-300:]})", file=sys.stderr)
        except Exception as e:
            print(f"{argv[-1]} failed: {e}", file=sys.stderr)
        return None

    train_metrics = None
    vit3d_large = None
    if on_tpu and not smoke:
        tdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        tj = _sub_json(
            [sys.executable, os.path.join(tdir, "bench_train.py")],
            {"BENCH_TRAIN_TIER": "medium_dense"},
        )
        if tj:
            train_metrics = {
                "tokens_per_sec": tj.get("value"),
                "mfu": tj.get("train_mfu"),
                "config": tj.get("config"),
            }
        vj = _sub_json(
            [sys.executable, os.path.join(tdir, "bench_vit3d.py")],
            {"BENCH_VIT3D_TIERS": "large"},
        )
        if vj:
            vit3d_large = {
                "frames_per_sec": vj.get("value"),
                "config": vj.get("config"),
            }

    # --- roofline position of the headline number ---
    avg_ctx = prompt_len + decode_steps / 2
    step_s = batch / paged_tps
    flops_tok = _decode_flops_per_token(cfg, avg_ctx)
    mfu = paged_tps * flops_tok / PEAK_FLOPS
    bytes_step = _decode_bytes_per_step(cfg, n_params, batch, avg_ctx)
    hbm_util = bytes_step / step_s / PEAK_HBM_BPS

    baseline = None
    if smoke:
        pass  # tiny smoke shapes are incomparable to the medium calibration
    elif os.path.exists(_CALIB_FILE):
        try:
            with open(_CALIB_FILE) as f:
                baseline = json.load(f).get("reference_cpu_decode_toks_per_sec")
        except Exception:
            baseline = None
    vs_baseline = (paged_tps / baseline) if baseline else None

    print(json.dumps({
        "metric": "moe_decode_tokens_per_sec_per_chip",
        "value": round(paged_tps, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "config": (
            ("CPU SMOKE (tiny shapes) — " if smoke else "")
            + f"d{cfg.d_model}/{cfg.num_heads}h/{cfg.query_groups}g/"
            f"{cfg.num_layers}L vocab{cfg.vocab_size} "
            f"E{cfg.num_experts}top{cfg.top_k} "
            f"({n_params / 1e9:.2f}B params bf16), B={batch}, "
            f"prompt {prompt_len}, {decode_steps} decode steps, paged KV "
            f"(Pallas decode kernel, page_size={PAGE_SIZE}), "
            "exact top-k=50 sampling"
        ),
        "params_b": round(n_params / 1e9, 3),
        "hbm_bw_utilization": round(hbm_util, 3),
        "model_flops_utilization": round(mfu, 4),
        "vit3d_frames_per_sec": round(vit3d_fps, 1),
        "flash_vs_xla_prefill_speedup": kernel_speedup,
        "secondary": {
            "dense_cache_exact_topk_toks_per_sec": round(dense_tps, 2),
            "dense_cache_greedy_toks_per_sec": round(greedy_tps, 2),
            "int8_paged_toks_per_sec": round(int8_paged_tps, 2),
            "int8_dense_toks_per_sec": round(int8_dense_tps, 2),
            "int8kv_paged_toks_per_sec": round(int8kv_paged_tps, 2),
            "int8_w_kv_paged_toks_per_sec": round(int8_wkv_paged_tps, 2),
            "int8_w_kv_paged_b256_toks_per_sec": (
                round(int8_wkv_b256_tps, 2) if int8_wkv_b256_tps else None
            ),
            "ctx32k_swa_ring_toks_per_sec": (
                round(ctx32k_tps, 2) if ctx32k_tps else None
            ),
            "train": train_metrics,
            "vit3d_large": vit3d_large,
        },
    }))


if __name__ == "__main__":
    main()
