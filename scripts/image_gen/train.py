#!/usr/bin/env python
"""Text->image generation training entry point.

The reference's image-gen train scripts are EMPTY files
(/root/reference/scripts/autoregressive_image_gen/**/train.py, 0 LoC —
SURVEY.md §2.6).  This drives the ImageGenTrainer (VQ + recon + token CE)
with text conditioning from the text encoder; synthetic mode offline.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vats_tpu.utils.env import maybe_force_cpu

    maybe_force_cpu()
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="tiny", choices=["tiny", "xsmall"])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from vats_tpu.configs.image_gen import image_gen_tiny_test, image_gen_xsmall
    from vats_tpu.models.image_gen import TransformerTextEncoder
    from vats_tpu.train.image_gen import ImageGenTrainer, ImageGenTrainingArgs
    from vats_tpu.utils import setup_logger

    logger = setup_logger("training")
    cfg = (image_gen_tiny_test if args.size == "tiny" else image_gen_xsmall)()
    targs = ImageGenTrainingArgs()

    rng = np.random.RandomState(args.seed)
    text_encoder = TransformerTextEncoder(cfg)
    text_ids = jnp.asarray(
        rng.randint(1, cfg.vocab_size, (args.batch_size, 8)), jnp.int32
    )
    enc_params = text_encoder.init(jax.random.PRNGKey(args.seed), text_ids)

    def make_batch(step):
        r = np.random.RandomState(args.seed + step)
        images = jnp.asarray(
            r.rand(args.batch_size, cfg.C_in_out, cfg.target_size,
                   cfg.target_size), jnp.float32,
        )
        ids = jnp.asarray(
            r.randint(1, cfg.vocab_size, (args.batch_size, 8)), jnp.int32
        )
        text_emb = text_encoder.apply(enc_params, ids)
        return {"images": images, "text_embeddings": text_emb}

    trainer = ImageGenTrainer(
        cfg, targs, num_training_steps=args.steps,
        sample_batch=make_batch(0),
    )
    for step in range(args.steps):
        metrics = trainer.train_step(make_batch(step))
        if step % args.log_every == 0:
            logger.info("step %d: %s", step,
                        {k: round(v, 4) for k, v in metrics.items()})
    logger.info("done")


if __name__ == "__main__":
    main()
