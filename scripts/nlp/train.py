#!/usr/bin/env python
"""MoE text-LM training entry point.

Counterpart of /root/reference/scripts/transformers/nlp/train.py:33-300:
tokenizer setup, dataset materialization + 90/10 split, token-budget training
loop with periodic validation / best+regular checkpoints / early stopping /
sample generation ("Once upon a time, ", train.py:271-280).

Differences: argparse CLI (the reference hardcodes function defaults), an
offline synthetic-data mode (this container has no network for HF streaming),
and a single jitted train step.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description="Train the MoE text LM")
    p.add_argument("--size", default="xsmall",
                   choices=["xsmall", "small", "medium", "large", "xlarge"])
    p.add_argument("--dataset", default="synthetic",
                   help="'synthetic' or a HF dataset name (needs network)")
    p.add_argument("--tokenizer", default="mistralai/Mistral-7B-v0.1")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=None)
    p.add_argument("--max-train-tokens", type=int, default=5_000_000)
    p.add_argument("--eval-every-steps", type=int, default=200)
    p.add_argument("--ckpt-dir", default="checkpoints/nlp")
    p.add_argument("--resume", default=None,
                   help="checkpoint path to resume from (model args are "
                        "restored from its metadata)")
    p.add_argument("--early-stop-patience", type=int, default=5)
    p.add_argument("--sample-prompt", default="Once upon a time, ")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fused-ce-chunk", type=int, default=None,
                   help="fused readout+cross-entropy chunk size (avoids the "
                        "[B, T, V] logits buffer; try 128)")
    p.add_argument("--mesh", default=None,
                   help="comma-separated mesh axes 'data=2,fsdp=4,tensor=1' — "
                        "enables sharded training over all (local or global) "
                        "devices; -1 absorbs the rest (e.g. 'fsdp=-1')")
    p.add_argument("--multihost", action="store_true",
                   help="connect this process to a multi-host job first "
                        "(jax.distributed; autodetects on Cloud TPU, or set "
                        "COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID). "
                        "--batch-size is the GLOBAL batch; each host loads "
                        "only its rows")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (--multihost)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def parse_mesh_arg(spec):
    axes = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        axes[k.strip()] = int(v)
    return axes


def main():
    from vats_tpu.utils.env import maybe_force_cpu

    maybe_force_cpu()
    args = parse_args()
    from vats_tpu.checkpoint import CheckpointManager
    from vats_tpu.configs import GenerationArgs, TrainingArgs
    from vats_tpu.configs.nlp import NLP_TIERS
    from vats_tpu.data import synthetic_lm_batches
    from vats_tpu.models import TextLM
    from vats_tpu.train import (
        create_optimizer,
        create_train_state,
        make_train_step,
        train,
        validate,
    )
    from vats_tpu.utils import plot_metrics, setup_logger

    logger = setup_logger("training")
    model_args = NLP_TIERS[args.size]()
    if args.resume:
        # restore args first (the reference's load_only_args mode,
        # scripts/transformers/nlp/train.py:62-74), then states below
        from vats_tpu.checkpoint import load_checkpoint
        from vats_tpu.configs import ModelArgs as _MA

        _, resume_meta = load_checkpoint(args.resume)
        if resume_meta.get("model_args"):
            model_args = _MA.from_dict(resume_meta["model_args"])
            logger.info("resumed model args from %s", args.resume)
    training_args = TrainingArgs(
        batch_size=args.batch_size, max_train_tokens=args.max_train_tokens,
        fused_ce_chunk=args.fused_ce_chunk,
    )
    seq_len = args.seq_len or min(model_args.max_seq_len, 512)

    logger.info("model: %s | %s", args.size, model_args)
    model = TextLM(model_args)

    tokenizer = None
    if args.dataset == "synthetic":
        def make_iter(seed):
            return synthetic_lm_batches(
                jax.random.PRNGKey(seed),
                vocab_size=model_args.vocab_size,
                batch_size=args.batch_size,
                seq_len=seq_len,
                pad_fraction=0.1,
            )
        train_iter = make_iter(args.seed)
        def val_iter():
            return make_iter(args.seed + 1)
    else:
        from transformers import AutoTokenizer

        from vats_tpu.data.text_cleaning import (
            DeduplicationFilter,
            TextQualityFilter,
        )
        from vats_tpu.data.text_dataset import TextDataset, train_val_split

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        if tokenizer.pad_token_id is None:
            tokenizer.pad_token = tokenizer.eos_token
        quality = TextQualityFilter()
        dedup = DeduplicationFilter()
        dataset = TextDataset.from_hf_streaming(
            args.dataset, tokenizer, seq_len,
            filters=[quality.filter_text,
                     lambda t: None if dedup.is_duplicate(t) else t],
        )
        train_ds, val_ds = train_val_split(dataset)
        train_iter = train_ds.batches(args.batch_size, epochs=None,
                                      seed=args.seed)
        def val_iter():
            return val_ds.batches(args.batch_size, epochs=1, shuffle=False)

    est_steps = max(1, args.max_train_tokens // (args.batch_size * seq_len))

    mesh = None
    if args.multihost or args.mesh:
        # sharded training over a device mesh (optionally spanning hosts):
        # jax.distributed wiring + host-sharded data feeding
        if args.multihost:
            from vats_tpu.parallel.multihost import initialize_multihost

            initialize_multihost(
                args.coordinator, args.num_processes, args.process_id
            )
            logger.info(
                "multihost: process %d/%d, %d global devices",
                jax.process_index(), jax.process_count(), len(jax.devices()),
            )
        from vats_tpu.parallel import create_mesh
        from vats_tpu.parallel.multihost import (
            host_shard_slice,
            make_global_batch,
        )
        from vats_tpu.parallel.sharded import make_sharded_train

        axes = parse_mesh_arg(args.mesh) if args.mesh else {"fsdp": -1}
        mesh = create_mesh(**axes)
        logger.info("mesh: %s", dict(mesh.shape))

        def distribute(it):
            import numpy as np

            sl = host_shard_slice(args.batch_size)
            for b in it:
                local = {k: np.asarray(v)[sl] for k, v in b.items()}
                yield make_global_batch(local, mesh)

        import itertools

        train_iter = distribute(train_iter)
        sample = next(train_iter)
        train_iter = itertools.chain([sample], train_iter)
        init_fn, step_fn, state_shardings = make_sharded_train(
            model, training_args, mesh, sample, num_training_steps=est_steps
        )
        state = init_fn(jax.random.PRNGKey(args.seed))
        _val_iter = val_iter

        def val_iter():
            return distribute(_val_iter())

    else:
        tx = create_optimizer(training_args, est_steps)
        state = create_train_state(
            model, tx, jax.random.PRNGKey(args.seed),
            jnp.zeros((args.batch_size, seq_len), jnp.int32),
        )
        step_fn = make_train_step(model, training_args)
    if args.resume:
        from vats_tpu.checkpoint import load_checkpoint

        if mesh is not None:
            # restore straight into the sharded layout: device_get on a
            # globally-sharded state raises on real multi-host jobs (shards
            # are not all addressable from one process)
            abstract = jax.tree_util.tree_map(
                lambda x, s: jax.ShapeDtypeStruct(
                    jnp.shape(x), x.dtype, sharding=s
                ),
                state,
                state_shardings,
            )
            restored, _ = load_checkpoint(args.resume, target=abstract)
        else:
            restored, _ = load_checkpoint(
                args.resume, target=jax.device_get(state)
            )
        state = restored.replace(apply_fn=model.apply)
        logger.info("resumed state: tokens_seen=%d", int(state.tokens_seen))
    ckpt = CheckpointManager(args.ckpt_dir, model_args=model_args,
                             training_args=training_args)

    rng = jax.random.PRNGKey(args.seed + 2)
    bad_evals = 0
    history = {"train_loss": [], "val_loss": [], "val_ppl": []}
    while int(state.tokens_seen) < args.max_train_tokens:
        rng, loop_rng = jax.random.split(rng)
        state, summary = train(
            model, state, train_iter, training_args, rng=loop_rng,
            max_steps=args.eval_every_steps, train_step_fn=step_fn,
            log_every=max(1, args.eval_every_steps // 4),
        )
        metrics = validate(model, state, val_iter(), training_args,
                           max_batches=20)
        logger.info(
            "tokens=%d train_loss=%.4f val_loss=%.4f val_ppl=%.2f",
            summary["tokens_seen"], summary["avg_loss"],
            metrics["val_loss"], metrics["val_perplexity"],
        )
        history["train_loss"].append(summary["avg_loss"])
        history["val_loss"].append(metrics["val_loss"])
        history["val_ppl"].append(metrics["val_perplexity"])
        saved = ckpt.maybe_save(state, metrics["val_loss"], force_regular=True)
        bad_evals = 0 if saved["best"] else bad_evals + 1
        if bad_evals >= args.early_stop_patience:
            logger.info("early stopping after %d stale evals", bad_evals)
            break
        if summary["steps"] == 0:
            break

        if tokenizer is not None:
            from vats_tpu.inference import TokenGenerator

            gen = TokenGenerator(model_args, params={"params": state.params})
            sample = gen.generate_tokens(
                args.sample_prompt, GenerationArgs(max_new_tokens=48),
                tokenizer,
            )
            logger.info("sample: %s", sample)

    plot_metrics(history, "nlp_training_metrics.png", title="MoE Text LM")
    logger.info("done: tokens_seen=%d", int(state.tokens_seen))


if __name__ == "__main__":
    main()
