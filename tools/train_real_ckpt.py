#!/usr/bin/env python
"""Train ONE small real checkpoint end-to-end (VERDICT r4 next-step #5).

Every quality number through round 4 (int8 deltas, spec-decode acceptance,
ppl) was measured on random-init weights.  This tool produces actual
trained weights the quality benches can run against:

  * corpus: byte-level tokens over the container's local source text
    (.py/.rst/.md/.txt under /opt and /usr/lib/python3.11 — the only
    sizeable text available with zero egress), one document per file,
    packed into fixed-length rows with segment ids by the native C packer
    (data/shard_dataset.py)
  * model: the d512/8L MoE tier (E=4 top-2, GQA, SWA window 128 —
    exercising the flash kernel's causal+window+segment masking in real
    training), bf16 params, fused-CE readout
  * loop: the REAL train/val machinery (train.loop + optax adamw +
    cosine), orbax checkpointing, loss-curve artifact, and the reference's
    sample-generation-during-training analogue
    (/root/reference/scripts/transformers/nlp/train.py:271-280)

Artifacts under checkpoints/real_d512/: shard.npz, best/ (orbax),
loss_curve.json, loss_curve.png, samples.txt

Env: TRAIN_CKPT_STEPS (default 3000), TRAIN_CKPT_BATCH (16),
     TRAIN_CKPT_SEQ (512), TRAIN_CKPT_MAX_MB (60), TRAIN_CKPT_SMOKE=1
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
OUT_DIR = os.path.join(_REPO, "checkpoints", "real_d512")

PAD = 0  # byte b encodes as b + 1; 0 stays the pad id

CORPUS_ROOTS = ("/opt", "/usr/lib/python3.11")
CORPUS_EXTS = (".py", ".rst", ".md", ".txt")


def build_shard(max_mb: float, seq_len: int):
    """Byte-tokenize local source files into a TokenShard (cached).

    Files are SAMPLED uniformly across the whole tree (path-hash keyed, so
    the corpus is not dominated by whatever package sorts first), passed
    through the framework's exact-dedup filter, and SHUFFLED doc-wise by a
    content-hash key so the held-out tail is a random split, not the last
    package walked."""
    import hashlib

    from vats_tpu.data.shard_dataset import TokenShard
    from vats_tpu.data.text_cleaning import DeduplicationFilter

    path = os.path.join(OUT_DIR, "shard.npz")
    if os.path.exists(path):
        return TokenShard.load(path)
    # first pass: candidate list (path + size only)
    cands = []
    for root in CORPUS_ROOTS:
        for dirpath, _, files in os.walk(root):
            if ".jax_cache" in dirpath or "__pycache__" in dirpath:
                continue
            for f in files:
                if not f.endswith(CORPUS_EXTS):
                    continue
                fp = os.path.join(dirpath, f)
                try:
                    sz = os.path.getsize(fp)
                except OSError:
                    continue
                if 2 * seq_len <= sz <= 512 * 1024:
                    cands.append((fp, sz))
    total_avail = sum(sz for _, sz in cands)
    budget = max_mb * 1e6
    keep_frac = min(1.0, budget / max(total_avail, 1))
    dedup = DeduplicationFilter()
    docs, total = [], 0
    # path-hash sampling keeps a deterministic uniform slice of the tree
    for fp, sz in cands:
        h = int(hashlib.md5(fp.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
        if h > keep_frac:
            continue
        try:
            raw = open(fp, "rb").read()
        except OSError:
            continue
        text = raw.decode("utf-8", errors="ignore")
        if dedup.is_duplicate(text):
            continue
        docs.append((fp, raw))
        total += len(raw)
        if total >= budget:
            break
    # content-hash shuffle -> the 95/5 doc split is random w.r.t. packages
    docs.sort(key=lambda d: hashlib.md5(d[1][:256]).hexdigest())
    token_docs = [
        (np.frombuffer(raw, np.uint8).astype(np.int32) + 1).tolist()
        for _, raw in docs
    ]
    shard = TokenShard.from_documents(token_docs)
    os.makedirs(OUT_DIR, exist_ok=True)
    shard.save(path)
    print(f"corpus: {len(docs)} docs, {total / 1e6:.1f} MB bytes "
          f"(sampled {keep_frac:.1%} of {total_avail / 1e6:.0f} MB, "
          f"deduped)", flush=True)
    return shard


def model_config(smoke: bool):
    from vats_tpu.configs import nlp_xsmall

    kw = dict(
        d_model=512, num_heads=8, query_groups=2, d_ffn=2048, num_layers=8,
        vocab_size=257, max_seq_len=512, left_window=128, right_window=0,
        dropout=0.1, num_experts=4, top_k=2, moe_dispatch="sort",
        capacity_factor=1.25, use_mqa=False, tie_weights=True,
        param_dtype="bfloat16", dtype="bfloat16",
        gradient_checkpointing=False,
    )
    if smoke:
        kw.update(d_model=64, num_heads=4, query_groups=2, d_ffn=128,
                  num_layers=2, max_seq_len=128)
    return nlp_xsmall(**kw)


def sample_text(model, params, cfg, prompt: bytes, n: int = 160) -> str:
    """Greedy continuation (the reference's mid-training 'Once upon a
    time,' sampling, train.py:271-280 — here a code prompt)."""
    from vats_tpu.inference.generate import generate

    ids = jnp.asarray(
        [np.frombuffer(prompt, np.uint8).astype(np.int32) + 1], jnp.int32
    )
    toks, lengths = generate(
        model, {"params": params["params"]} if "params" in params else params,
        ids, None, jax.random.PRNGKey(0), max_new_tokens=n,
        temperature=0.0, do_sample=False, pad_token_id=PAD,
        total_len=min(cfg.max_seq_len, ids.shape[1] + n),
    )
    out = np.asarray(toks[0][: int(lengths[0])])
    return bytes((out[out > 0] - 1).astype(np.uint8)).decode(
        "utf-8", errors="replace"
    )


def main():
    smoke = os.environ.get("TRAIN_CKPT_SMOKE", "") == "1"
    steps = int(os.environ.get("TRAIN_CKPT_STEPS", "20" if smoke else "3000"))
    batch_size = int(os.environ.get("TRAIN_CKPT_BATCH", "4" if smoke else "16"))
    seq_len = int(os.environ.get("TRAIN_CKPT_SEQ", "128" if smoke else "512"))
    max_mb = float(os.environ.get("TRAIN_CKPT_MAX_MB", "2" if smoke else "60"))
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
        )

    from vats_tpu.checkpoint import save_checkpoint
    from vats_tpu.configs import TrainingArgs
    from vats_tpu.data.shard_dataset import ShardDataset
    from vats_tpu.models import TextLM
    from vats_tpu.train import create_optimizer, create_train_state
    from vats_tpu.train.loop import make_eval_step, make_train_step_fn

    os.makedirs(OUT_DIR, exist_ok=True)
    shard = build_shard(max_mb, seq_len)
    ds = ShardDataset(shard, seq_len=seq_len, pad_id=PAD)
    cfg = model_config(smoke)
    model = TextLM(cfg)
    targs = TrainingArgs(
        learning_rate=3e-4, weight_decay=0.1, warmup_ratio=0.05,
        grad_accum_steps=1, batch_size=batch_size, fused_ce_chunk=128,
        adam_mu_dtype="bfloat16",
    )
    tx = create_optimizer(targs, steps)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.ones((1, seq_len), jnp.int32),
    )
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    print(f"model: {n_params / 1e6:.1f}M params, {steps} steps x "
          f"{batch_size}x{seq_len} packed tokens", flush=True)

    step_fn = jax.jit(make_train_step_fn(model, targs), donate_argnums=(0,))
    eval_fn = make_eval_step(model, targs)

    # held-out tail: last 5% of documents
    n_docs = shard.num_docs
    val_start = int(n_docs * 0.95)

    def batches(packed_start, end, seed):
        rng = np.random.RandomState(seed)
        doc = packed_start
        while True:
            b, consumed = ds.pack_sequences(doc, batch_size)
            if consumed == 0 or doc >= end:
                doc = packed_start + int(rng.randint(0, 50))
                continue
            doc += consumed
            yield {k: jnp.asarray(v) for k, v in b.items()}

    train_iter = batches(0, val_start, 0)
    curve = []
    t0 = time.time()
    rng = jax.random.PRNGKey(1)
    best_val = float("inf")
    for step in range(1, steps + 1):
        rng, srng = jax.random.split(rng)
        state, metrics = step_fn(state, next(train_iter), srng)
        if step % max(1, steps // 60) == 0 or step == steps:
            loss = float(metrics["loss"])
            tokens = int(state.tokens_seen)
            elapsed = time.time() - t0
            # held-out loss over a few fixed batches
            vb, _ = ds.pack_sequences(val_start, batch_size)
            vm = eval_fn(state.params, {k: jnp.asarray(v) for k, v in vb.items()})
            vloss = float(vm["loss"])
            curve.append({"step": step, "loss": round(loss, 4),
                          "val_loss": round(vloss, 4), "tokens": tokens,
                          "wall_s": round(elapsed, 1)})
            print(json.dumps(curve[-1]), flush=True)
            with open(os.path.join(OUT_DIR, "loss_curve.json"), "w") as f:
                json.dump(curve, f, indent=1)
            if vloss < best_val and (step > steps // 4 or smoke):
                best_val = vloss
                save_checkpoint(
                    OUT_DIR, jax.device_get(state), model_args=cfg,
                    training_args=targs, loss=vloss, is_best=True,
                )

    # artifacts: loss curve plot + greedy samples
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        xs = [c["tokens"] / 1e6 for c in curve]
        plt.figure(figsize=(7, 4))
        plt.plot(xs, [c["loss"] for c in curve], label="train")
        plt.plot(xs, [c["val_loss"] for c in curve], label="held-out")
        plt.xlabel("Mtokens")
        plt.ylabel("loss (nats/byte)")
        plt.title(f"real ckpt: d{cfg.d_model}/{cfg.num_layers}L "
                  f"E{cfg.num_experts} byte-LM on local source text")
        plt.legend()
        plt.grid(alpha=0.3)
        plt.savefig(os.path.join(OUT_DIR, "loss_curve.png"), dpi=110,
                    bbox_inches="tight")
    except Exception as e:  # noqa: BLE001
        print(f"plot skipped: {e}", file=sys.stderr)

    prompts = [b"def main(", b"import os\nimport sys\n", b"class Model"]
    with open(os.path.join(OUT_DIR, "samples.txt"), "w") as f:
        for p in prompts:
            txt = sample_text(model, {"params": state.params}, cfg, p)
            f.write(f"=== prompt: {p!r}\n{txt}\n\n")
    print(json.dumps({
        "final_train_loss": curve[-1]["loss"],
        "final_val_loss": curve[-1]["val_loss"],
        "best_val_loss": round(best_val, 4),
        "tokens": curve[-1]["tokens"],
        "params_m": round(n_params / 1e6, 1),
        "wall_s": curve[-1]["wall_s"],
        "ckpt": OUT_DIR,
    }), flush=True)


if __name__ == "__main__":
    main()
