"""Image-gen training: VQ-VAE trainer mirroring ``ImageGenTrainer``.

Reference (/root/reference/training/autoregressive_image_gen/
autoregressive_transformer/loops/training_loop.py:25-166): class-based epoch
trainer whose train_step backprops the VQ loss only (:69-77, the transformer
output is unused in the loss — SURVEY.md §3.4).  For parity the default loss
is the VQ loss; the framework additionally offers reconstruction MSE and
next-token CE on the codebook indices (``use_recon_loss`` /
``use_token_ce``) since a generator cannot actually train without them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vats_tpu.configs.image_gen import ImageGenArgs
from vats_tpu.models.image_gen import VQVAE
from vats_tpu.train.optimizer import cosine_with_warmup_schedule


@dataclass
class ImageGenTrainingArgs:
    learning_rate: float = 3e-4
    weight_decay: float = 5e-4
    betas: Tuple[float, float] = (0.9, 0.95)
    epsilon: float = 1e-6
    clip_grad_norm: float = 1.0
    warmup_ratio: float = 0.05
    num_cycles: float = 0.5
    grad_accum_steps: int = 1
    use_recon_loss: bool = True
    use_token_ce: bool = True
    recon_weight: float = 1.0
    token_ce_weight: float = 1.0
    seed: int = 42


class ImageGenTrainer:
    """Owns the VQVAE variables (params + batch_stats) and the jitted step."""

    def __init__(
        self,
        cfg: ImageGenArgs,
        args: ImageGenTrainingArgs,
        num_training_steps: int = 1000,
        variables: Optional[Any] = None,
        sample_batch: Optional[Dict[str, jnp.ndarray]] = None,
    ):
        self.cfg = cfg
        self.args = args
        self.model = VQVAE(cfg)
        rng = jax.random.PRNGKey(args.seed)
        if variables is None:
            if sample_batch is None:
                raise ValueError("need sample_batch to initialize")
            variables = self.model.init(
                rng,
                sample_batch["images"],
                sample_batch["text_embeddings"],
                deterministic=True,
            )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        schedule = cosine_with_warmup_schedule(
            args.learning_rate,
            int(args.warmup_ratio * num_training_steps),
            num_training_steps,
            args.num_cycles,
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(args.clip_grad_norm),
            optax.adamw(
                learning_rate=schedule,
                b1=args.betas[0],
                b2=args.betas[1],
                eps=args.epsilon,
                weight_decay=args.weight_decay,
            ),
        )
        self.opt_state = self.tx.init(self.params)
        self._rng = jax.random.PRNGKey(args.seed + 1)
        self._step = self._build_step()

    def _build_step(self):
        model, args, cfg, tx = self.model, self.args, self.cfg, self.tx

        def loss_fn(params, batch_stats, batch, rng):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["images"],
                batch["text_embeddings"],
                batch.get("image_attention_mask"),
                batch.get("text_attention_mask"),
                deterministic=False,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            recon, vq_loss, indices, transformer_out = outputs
            loss = vq_loss
            metrics = {"vq_loss": vq_loss}
            if args.use_recon_loss:
                recon_loss = jnp.mean(
                    (recon.astype(jnp.float32) - batch["images"].astype(jnp.float32))
                    ** 2
                )
                loss = loss + args.recon_weight * recon_loss
                metrics["recon_loss"] = recon_loss
            if args.use_token_ce:
                # next-token CE in raster order using the transformer's head
                b, h, w, d = transformer_out.shape
                flat_feats = transformer_out.reshape(b, h * w, d)
                head = params["model"]["to_logits"]["kernel"]
                kern = head.value if hasattr(head, "value") else head
                logits = (
                    flat_feats.astype(jnp.float32) @ kern.astype(jnp.float32)
                )
                targets = indices.reshape(b, h * w)
                logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
                nll = -jnp.take_along_axis(
                    logp, targets[:, 1:, None], axis=-1
                )[..., 0]
                ce = jnp.mean(nll)
                loss = loss + args.token_ce_weight * ce
                metrics["token_ce"] = ce
            metrics["loss"] = loss
            return loss, (metrics, mutated["batch_stats"])

        def step(params, batch_stats, opt_state, batch, rng):
            (loss, (metrics, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, batch, rng)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_bs, new_opt, metrics

        return jax.jit(step, donate_argnums=(0, 1, 2))

    def train_step(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, float]:
        self._rng, rng = jax.random.split(self._rng)
        self.params, self.batch_stats, self.opt_state, metrics = self._step(
            self.params, self.batch_stats, self.opt_state, batch, rng
        )
        return {k: float(v) for k, v in metrics.items()}

    def evaluate(
        self, data_iter: Iterable[Dict[str, jnp.ndarray]], max_batches: int = 10**9
    ) -> Dict[str, float]:
        """Validation pass (the reference's image-gen validation loop is an
        empty file, SURVEY.md §2.6): deterministic forward, VQ + recon loss."""
        if not hasattr(self, "_eval_step"):
            model, args = self.model, self.args

            def eval_step(params, batch_stats, batch):
                recon, vq_loss, indices, _ = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch["images"],
                    batch["text_embeddings"],
                    batch.get("image_attention_mask"),
                    batch.get("text_attention_mask"),
                    deterministic=True,
                )
                recon_loss = jnp.mean(
                    (recon.astype(jnp.float32)
                     - batch["images"].astype(jnp.float32)) ** 2
                )
                return {"vq_loss": vq_loss, "recon_loss": recon_loss,
                        "loss": vq_loss + recon_loss}

            self._eval_step = jax.jit(eval_step)
        total: Dict[str, float] = {}
        n = 0
        for batch in data_iter:
            if n >= max_batches:
                break
            m = self._eval_step(self.params, self.batch_stats, batch)
            for k, v in m.items():
                total[k] = total.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in total.items()} | {"batches": n}

    def train(
        self, data_iter: Iterable[Dict[str, jnp.ndarray]], max_steps: int = 10**9
    ) -> Dict[str, float]:
        total: Dict[str, float] = {}
        n = 0
        for batch in data_iter:
            if n >= max_steps:
                break
            m = self.train_step(batch)
            for k, v in m.items():
                total[k] = total.get(k, 0.0) + v
            n += 1
        return {k: v / max(n, 1) for k, v in total.items()} | {"steps": n}
