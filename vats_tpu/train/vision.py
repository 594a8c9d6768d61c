"""Vision training: epoch-level warmup-cosine schedule, mixed-label CE loops.

Reference: /root/reference/training/transformers/vision/
{cosine_scheduler.py:5-29, setup_training_components.py:13-50},
vit_2d/loops/{training_loop.py:17-116, validation_loop.py:14-65},
vit_3d/train_val/*.  One jitted step does augmentation (on device), forward,
mixed-label smoothed CE, and the (accumulated) optimizer update.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vats_tpu.data.augmentations import random_augmentation
from vats_tpu.train.state import TrainState


@dataclass
class VisionTrainingArgs:
    """Mirrors /root/reference/configs/transformers/vision/vit_2d/training_args.py."""

    learning_rate: float = 2e-4
    epochs: int = 300
    batch_size: int = 256
    epsilon: float = 1e-6
    max_norm: float = 1.0
    weight_decay: float = 5e-4
    betas: Tuple[float, float] = (0.9, 0.95)
    warmup_epochs: int = 50
    eta_min: float = 6e-7
    save_checkpoint_freq: int = 1
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 0.8
    label_smoothing: float = 0.1
    grad_accum_steps: int = 4
    use_augmentation: bool = True
    # augmentation battery knobs (reference setup_data.py:25-39).  Host path:
    # pass these into data.vision_data.setup_data_loaders (the vit2d script
    # does).  Device path: set pixel_augs_on_device=True AND build the loader
    # with raw_images=True (crop/flip-only [0, 1] batches) — the battery then
    # runs inside the jitted step (vats_tpu/data/pixel_augs.py).  color_jitter
    # is host-only (no on-device ColorJitter op).
    auto_augment: bool = True
    random_rotation_degrees: float = 15.0
    random_erasing_prob: float = 0.4
    color_jitter: float = 0.4
    pixel_augs_on_device: bool = False
    seed: int = 42


def warmup_cosine_epoch_schedule(
    base_lr: float,
    warmup_epochs: int,
    total_epochs: int,
    eta_min: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """Reference WarmupCosineScheduler lr_lambda, stepped per epoch:
    (epoch+1)/warmup during warmup, then eta_min + (1-eta_min)*cos decay."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // max(1, steps_per_epoch)
        warm = (epoch + 1.0) / max(1, warmup_epochs)
        progress = (epoch - warmup_epochs) / max(1, total_epochs - warmup_epochs)
        decay = eta_min + (1 - eta_min) * 0.5 * (
            1 + jnp.cos(math.pi * jnp.clip(progress, 0.0, 1.0))
        )
        return base_lr * jnp.where(epoch < warmup_epochs, warm, decay)

    return schedule


def create_vision_optimizer(
    args: VisionTrainingArgs, steps_per_epoch: int
) -> optax.GradientTransformation:
    schedule = warmup_cosine_epoch_schedule(
        args.learning_rate,
        args.warmup_epochs,
        args.epochs,
        args.eta_min,
        steps_per_epoch,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(args.max_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=args.betas[0],
            b2=args.betas[1],
            eps=args.epsilon,
            weight_decay=args.weight_decay,
        ),
    )
    if args.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=args.grad_accum_steps)
    return tx


def smoothed_ce(logits, targets, label_smoothing, num_classes):
    onehot = jax.nn.one_hot(targets, num_classes)
    soft = onehot * (1 - label_smoothing) + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(soft * logp, axis=-1))


def make_vision_train_step(
    model, args: VisionTrainingArgs, num_classes: int
) -> Callable:
    """Jitted step: on-device random augmentation + mixed-weighted smoothed CE
    (reference training_loop.py:57-95)."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        aug_rng, drop_rng = jax.random.split(rng)
        images, targets = batch["images"], batch["labels"]
        if args.pixel_augs_on_device:
            # images arrive RAW in [0, 1]; the full reference transform
            # battery runs on device inside this jitted step
            # (setup_data.py:25-39): rotate -> AutoAugment -> normalize ->
            # erase, then mixup/cutmix below.
            from vats_tpu.data.pixel_augs import (
                autoaugment_imagenet,
                random_erasing,
                random_rotation,
            )
            from vats_tpu.data.vision_data import IMAGENET_MEAN, IMAGENET_STD

            r_rot, r_aa, r_er, aug_rng = jax.random.split(aug_rng, 4)
            images = random_rotation(
                r_rot, images, args.random_rotation_degrees
            )
            if args.auto_augment:
                images = autoaugment_imagenet(r_aa, images)
            mean = jnp.asarray(IMAGENET_MEAN)[None, :, None, None]
            std = jnp.asarray(IMAGENET_STD)[None, :, None, None]
            images = (images - mean) / std
            images = random_erasing(
                r_er, images, p=args.random_erasing_prob
            )
        if args.use_augmentation:
            images, t_a, t_b, lam = random_augmentation(
                aug_rng, images, targets, args.mixup_alpha,
                cutmix_alpha=args.cutmix_alpha,
            )
        else:
            t_a = t_b = targets
            lam = jnp.float32(1.0)

        def loss_fn(params):
            logits = model.apply(
                {"params": params},
                images,
                deterministic=False,
                rngs={"dropout": drop_rng},
            )
            loss = lam * smoothed_ce(
                logits, t_a, args.label_smoothing, num_classes
            ) + (1 - lam) * smoothed_ce(
                logits, t_b, args.label_smoothing, num_classes
            )
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        preds = jnp.argmax(logits, axis=-1)
        # accuracy only meaningful for non-augmented batches (reference :103)
        acc = jnp.mean((preds == t_a).astype(jnp.float32))
        return new_state, {"loss": loss, "acc": acc, "lam": lam}

    return jax.jit(step, donate_argnums=(0,))


def make_vision_eval_step(model, num_classes: int) -> Callable:
    def step(params, batch):
        logits = model.apply(
            {"params": params}, batch["images"], deterministic=True
        )
        loss = smoothed_ce(logits, batch["labels"], 0.0, num_classes)
        acc = jnp.mean(
            (jnp.argmax(logits, axis=-1) == batch["labels"]).astype(jnp.float32)
        )
        return {"loss": loss, "acc": acc}

    return jax.jit(step)


def train_epoch(
    model,
    state: TrainState,
    data_iter: Iterable[Dict[str, jnp.ndarray]],
    args: VisionTrainingArgs,
    *,
    rng: jax.Array,
    num_classes: int,
    train_step_fn=None,
) -> Tuple[TrainState, Dict[str, float]]:
    train_step_fn = train_step_fn or make_vision_train_step(model, args, num_classes)
    total_loss, total_acc, n = 0.0, 0.0, 0
    for batch in data_iter:
        rng, step_rng = jax.random.split(rng)
        state, m = train_step_fn(state, batch, step_rng)
        total_loss += float(m["loss"])
        total_acc += float(m["acc"])
        n += 1
    denom = max(n, 1)
    return state, {
        "epoch_loss": total_loss / denom,
        "epoch_acc": 100.0 * total_acc / denom,
        "batches": n,
    }


def validate_epoch(
    model,
    state: TrainState,
    data_iter: Iterable[Dict[str, jnp.ndarray]],
    *,
    num_classes: int,
    eval_step_fn=None,
) -> Dict[str, float]:
    eval_step_fn = eval_step_fn or make_vision_eval_step(model, num_classes)
    total_loss, total_acc, n = 0.0, 0.0, 0
    for batch in data_iter:
        m = eval_step_fn(state.params, batch)
        total_loss += float(m["loss"])
        total_acc += float(m["acc"])
        n += 1
    denom = max(n, 1)
    return {
        "val_loss": total_loss / denom,
        "val_acc": 100.0 * total_acc / denom,
        "batches": n,
    }
