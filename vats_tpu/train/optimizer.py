"""Optimizer + LR schedule.

Mirrors the reference's training components
(/root/reference/training/transformers/nlp/setup_training_components.py:14-54):
AdamW(lr, betas, eps, weight_decay) with linear warmup then
``0.5 * (1 + cos(2*pi*num_cycles*progress))`` cosine decay
(/root/reference/training/transformers/nlp/cosine_scheduler.py:6-37).

TPU notes: optax.adamw is already fused under jit (the reference needs
``fused=True`` CUDA AdamW); no GradScaler — bf16 on TPU trains without loss
scaling.  Gradient clipping (reference: clip at accumulation boundary,
/root/reference/training/transformers/nlp/loops/training_loop.py:154-165) is
folded into the optax chain.  Grad accumulation uses optax.MultiSteps.
"""

from __future__ import annotations

import math
from typing import Optional

import optax

from vats_tpu.configs.nlp import TrainingArgs


def cosine_with_warmup_schedule(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
) -> optax.Schedule:
    """Reference lr_lambda as an optax schedule (multiplied by base_lr)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps
        )
        decay = 0.5 * (1.0 + jnp.cos(math.pi * 2.0 * num_cycles * progress))
        factor = jnp.where(step < num_warmup_steps, warmup, decay)
        return base_lr * factor

    return schedule


def create_optimizer(
    training_args: TrainingArgs,
    num_training_steps: int,
    *,
    grad_accum_steps: Optional[int] = None,
) -> optax.GradientTransformation:
    import jax.numpy as jnp

    mu_dtype = training_args.adam_mu_dtype
    if isinstance(mu_dtype, str):
        mu_dtype = jnp.dtype(mu_dtype)
    num_warmup_steps = int(training_args.warmup_ratio * num_training_steps)
    schedule = cosine_with_warmup_schedule(
        training_args.learning_rate,
        num_warmup_steps,
        num_training_steps,
        training_args.num_cycles,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(training_args.clip_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=training_args.betas[0],
            b2=training_args.betas[1],
            eps=training_args.epsilon,
            weight_decay=training_args.weight_decay,
            mu_dtype=mu_dtype,
        ),
    )
    accum = (
        grad_accum_steps
        if grad_accum_steps is not None
        else training_args.grad_accum_steps
    )
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    # Skip updates on non-finite grads (the TPU analogue of the reference's
    # per-step OOM/failure skip with max_skipped_steps,
    # /root/reference/training/transformers/nlp/loops/training_loop.py:76-80).
    tx = optax.apply_if_finite(tx, max_consecutive_errors=training_args.max_skipped_steps)
    return tx
