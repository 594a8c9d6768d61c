#!/usr/bin/env python
"""ViT-3D video classification training entry point.

Counterpart of /root/reference/scripts/transformers/vision/vit_3d/train.py:
25-168 (epoch loop, checkpoint resume, metric plotting).  The reference's
data loader is a ``pass`` stub; synthetic mode keeps this runnable offline,
and ``--clips-dir`` uses the designed .npy clip loader.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vats_tpu.utils.env import maybe_force_cpu

    maybe_force_cpu()
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="tiny", choices=["tiny", "xsmall", "large"])
    p.add_argument("--clips-dir", default=None)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--steps-per-epoch", type=int, default=10)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--ckpt-dir", default="checkpoints/vit3d")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from vats_tpu.checkpoint import CheckpointManager
    from vats_tpu.configs.vit3d import vit3d_large, vit3d_tiny_test, vit3d_xsmall
    from vats_tpu.data.vision_data import setup_video_loaders
    from vats_tpu.models.vit3d import VideoTransformer
    from vats_tpu.train.state import TrainState
    from vats_tpu.train.vision import (
        VisionTrainingArgs,
        create_vision_optimizer,
        make_vision_eval_step,
        make_vision_train_step,
        train_epoch,
        validate_epoch,
    )
    from vats_tpu.utils import plot_metrics, setup_logger

    logger = setup_logger("training")
    tiers = {"tiny": vit3d_tiny_test, "xsmall": vit3d_xsmall, "large": vit3d_large}
    cfg = tiers[args.size](use_classifier_head=True)
    frames = args.frames or cfg.max_frames
    targs = VisionTrainingArgs(
        epochs=args.epochs, batch_size=args.batch_size,
        warmup_epochs=max(1, args.epochs // 10), use_augmentation=False,
    )
    model = VideoTransformer(cfg)

    def synthetic_batches(seed):
        rng = np.random.RandomState(seed)
        th, tw = cfg.target_size
        for _ in range(args.steps_per_epoch):
            yield {
                "images": rng.rand(
                    args.batch_size, cfg.C_in, frames, th, tw
                ).astype(np.float32),
                "labels": rng.randint(0, cfg.num_classes, args.batch_size),
            }

    def data(seed):
        if args.clips_dir:
            def remap(it):
                for b in it:
                    yield {"images": b["videos"], "labels": b["labels"]}
            return (
                remap(setup_video_loaders(args.clips_dir, args.batch_size,
                                          seed=seed)),
                remap(setup_video_loaders(args.clips_dir, args.batch_size,
                                          shuffle=False, seed=seed)),
            )
        return synthetic_batches(seed), synthetic_batches(seed)

    th, tw = cfg.target_size
    sample = jnp.zeros((args.batch_size, cfg.C_in, frames, th, tw))
    variables = model.init(jax.random.PRNGKey(args.seed), sample)
    tx = create_vision_optimizer(targs, args.steps_per_epoch)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        tokens_seen=jnp.zeros((), jnp.int32),
        skipped_steps=jnp.zeros((), jnp.int32),
    )
    step_fn = make_vision_train_step(model, targs, cfg.num_classes)
    eval_fn = make_vision_eval_step(model, cfg.num_classes)
    ckpt = CheckpointManager(args.ckpt_dir, model_args=cfg, training_args=targs)

    history = {"train_loss": [], "val_loss": [], "val_acc": []}
    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        rng, erng = jax.random.split(rng)
        train_it, val_it = data(args.seed + epoch)
        state, tm = train_epoch(
            model, state, train_it, targs, rng=erng,
            num_classes=cfg.num_classes, train_step_fn=step_fn,
        )
        vm = validate_epoch(
            model, state, val_it, num_classes=cfg.num_classes,
            eval_step_fn=eval_fn,
        )
        logger.info(
            "epoch %d/%d loss=%.4f val_loss=%.4f val_acc=%.2f%%",
            epoch + 1, args.epochs, tm["epoch_loss"], vm["val_loss"],
            vm["val_acc"],
        )
        history["train_loss"].append(tm["epoch_loss"])
        history["val_loss"].append(vm["val_loss"])
        history["val_acc"].append(vm["val_acc"])
        ckpt.maybe_save(state, vm["val_loss"], force_regular=True)
    plot_metrics(history, "vit3d_training_metrics.png", title="ViT-3D")


if __name__ == "__main__":
    main()
