#!/usr/bin/env python
"""ViT-2D classification training entry point.

Counterpart of /root/reference/scripts/transformers/vision/vit_2d/train.py
(which cannot run as-is: broken imports and undefined config fields —
SURVEY.md §2.13.5).  Epoch loop with checkpointing, early stopping, and
metric plotting; synthetic-data mode for offline runs.
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
    p.add_argument("--size", default="xsmall", choices=["xsmall", "small", "medium"])
    p.add_argument("--data-dir", default=None, help="ImageFolder root; synthetic if unset")
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps-per-epoch", type=int, default=20)
    p.add_argument("--ckpt-dir", default="checkpoints/vit2d")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from vats_tpu.checkpoint import CheckpointManager
    from vats_tpu.configs.vit2d import vit2d_medium, vit2d_small, vit2d_xsmall
    from vats_tpu.data.vision_data import array_batches, setup_data_loaders
    from vats_tpu.models.vit2d import ImageEncoder
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
    tiers = {"xsmall": vit2d_xsmall, "small": vit2d_small, "medium": vit2d_medium}
    cfg = tiers[args.size](num_classes=args.num_classes)
    targs = VisionTrainingArgs(
        epochs=args.epochs, batch_size=args.batch_size,
        warmup_epochs=max(1, args.epochs // 10),
    )
    model = ImageEncoder(cfg)

    def data(split_seed):
        if args.data_dir:
            train_it, val_it = setup_data_loaders(
                f"{args.data_dir}/train", f"{args.data_dir}/val",
                args.batch_size, image_size=cfg.target_size,
                color_jitter=targs.color_jitter,
                random_rotation_degrees=targs.random_rotation_degrees,
                auto_augment=targs.auto_augment,
                random_erasing_prob=targs.random_erasing_prob,
                raw_images=targs.pixel_augs_on_device,
            )
            return train_it, val_it
        rng = np.random.RandomState(split_seed)
        n = args.batch_size * args.steps_per_epoch
        images = rng.rand(n, cfg.C_in, cfg.target_size, cfg.target_size)
        labels = rng.randint(0, args.num_classes, n)
        return (
            array_batches(images, labels, args.batch_size, seed=split_seed),
            array_batches(images[: 4 * args.batch_size],
                          labels[: 4 * args.batch_size],
                          args.batch_size, shuffle=False, seed=split_seed),
        )

    sample = jnp.zeros((args.batch_size, cfg.C_in, cfg.target_size, cfg.target_size))
    variables = model.init(jax.random.PRNGKey(args.seed), sample)
    tx = create_vision_optimizer(targs, args.steps_per_epoch)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        tokens_seen=jnp.zeros((), jnp.int32),
        skipped_steps=jnp.zeros((), jnp.int32),
    )
    step_fn = make_vision_train_step(model, targs, args.num_classes)
    eval_fn = make_vision_eval_step(model, args.num_classes)
    ckpt = CheckpointManager(args.ckpt_dir, model_args=cfg, training_args=targs)

    history = {"train_loss": [], "val_loss": [], "train_acc": [], "val_acc": []}
    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        rng, erng = jax.random.split(rng)
        train_it, val_it = data(args.seed + epoch)
        state, tm = train_epoch(
            model, state, train_it, targs, rng=erng,
            num_classes=args.num_classes, train_step_fn=step_fn,
        )
        vm = validate_epoch(
            model, state, val_it, num_classes=args.num_classes,
            eval_step_fn=eval_fn,
        )
        logger.info(
            "epoch %d/%d loss=%.4f acc=%.2f%% val_loss=%.4f val_acc=%.2f%%",
            epoch + 1, args.epochs, tm["epoch_loss"], tm["epoch_acc"],
            vm["val_loss"], vm["val_acc"],
        )
        for k, v in (("train_loss", tm["epoch_loss"]), ("val_loss", vm["val_loss"]),
                     ("train_acc", tm["epoch_acc"]), ("val_acc", vm["val_acc"])):
            history[k].append(v)
        ckpt.maybe_save(state, vm["val_loss"],
                        force_regular=(epoch + 1) % targs.save_checkpoint_freq == 0)
    plot_metrics(history, "vit2d_training_metrics.png", title="ViT-2D")


if __name__ == "__main__":
    main()
