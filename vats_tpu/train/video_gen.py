"""Video-gen training (the reference has NO training subtree for video gen —
SURVEY.md §2.7).  Two trainers:

  * ``VQVAE3DTrainer``: reconstruction + VQ loss on raw video clips
  * ``VideoTokenTrainer``: next-token CE over (frame, raster)-ordered codebook
    indices with text conditioning — the loss the AR transformer needs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vats_tpu.configs.video_gen import VideoGenArgs
from vats_tpu.models.video_gen import AutoregressiveVideoTransformer, VQVAE3D
from vats_tpu.train.optimizer import cosine_with_warmup_schedule


@dataclass
class VideoGenTrainingArgs:
    learning_rate: float = 3e-4
    weight_decay: float = 5e-4
    betas: Tuple[float, float] = (0.9, 0.95)
    epsilon: float = 1e-6
    clip_grad_norm: float = 1.0
    warmup_ratio: float = 0.05
    num_cycles: float = 0.5
    seed: int = 42


def _make_tx(args: VideoGenTrainingArgs, num_training_steps: int):
    schedule = cosine_with_warmup_schedule(
        args.learning_rate,
        int(args.warmup_ratio * num_training_steps),
        num_training_steps,
        args.num_cycles,
    )
    return optax.chain(
        optax.clip_by_global_norm(args.clip_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=args.betas[0],
            b2=args.betas[1],
            eps=args.epsilon,
            weight_decay=args.weight_decay,
        ),
    )


class VQVAE3DTrainer:
    def __init__(
        self,
        cfg: VideoGenArgs,
        args: VideoGenTrainingArgs,
        sample_videos: jnp.ndarray,
        num_training_steps: int = 1000,
    ):
        self.model = VQVAE3D(cfg)
        variables = self.model.init(
            jax.random.PRNGKey(args.seed), sample_videos, deterministic=True
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = _make_tx(args, num_training_steps)
        self.opt_state = self.tx.init(self.params)
        model, tx = self.model, self.tx

        def step(params, batch_stats, opt_state, videos):
            def loss_fn(p, bs):
                (recon, loss, idx), mutated = model.apply(
                    {"params": p, "batch_stats": bs},
                    videos,
                    deterministic=False,
                    mutable=["batch_stats"],
                )
                return loss, mutated["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats
            )
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_bs, new_opt, loss

        self._step = jax.jit(step, donate_argnums=(0, 1, 2))

    def train_step(self, videos: jnp.ndarray) -> float:
        self.params, self.batch_stats, self.opt_state, loss = self._step(
            self.params, self.batch_stats, self.opt_state, videos
        )
        return float(loss)


class VideoTokenTrainer:
    """Next-token CE over flat (frame, raster) order with shifted inputs."""

    def __init__(
        self,
        cfg: VideoGenArgs,
        args: VideoGenTrainingArgs,
        sample_batch: Dict[str, jnp.ndarray],
        num_training_steps: int = 1000,
        start_token_id: int = 0,
    ):
        self.cfg = cfg
        self.start_token_id = start_token_id
        self.model = AutoregressiveVideoTransformer(cfg)
        rng = jax.random.PRNGKey(args.seed)
        variables = self.model.init(
            rng,
            sample_batch["indices"],
            sample_batch["text_embeddings"],
            deterministic=True,
        )
        self.params = variables["params"]
        self.tx = _make_tx(args, num_training_steps)
        self.opt_state = self.tx.init(self.params)
        self._rng = jax.random.PRNGKey(args.seed + 1)
        model, tx, start_id = self.model, self.tx, start_token_id

        def step(params, opt_state, batch, rng):
            indices = batch["indices"]  # [B, T, H, W]
            b, t, h, w = indices.shape
            flat = indices.reshape(b, t * h * w)
            inputs = jnp.concatenate(
                [jnp.full((b, 1), start_id, jnp.int32), flat[:, :-1]], axis=1
            ).reshape(b, t, h, w)

            def loss_fn(p):
                logits, _ = model.apply(
                    {"params": p},
                    inputs,
                    batch["text_embeddings"],
                    text_mask=batch.get("text_mask"),
                    return_logits=True,
                    deterministic=False,
                    rngs={"dropout": rng},
                )
                logp = jax.nn.log_softmax(
                    logits.reshape(b, t * h * w, -1), axis=-1
                )
                nll = -jnp.take_along_axis(logp, flat[..., None], axis=-1)[..., 0]
                return jnp.mean(nll)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, batch: Dict[str, jnp.ndarray]) -> float:
        self._rng, rng = jax.random.split(self._rng)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, batch, rng
        )
        return float(loss)
