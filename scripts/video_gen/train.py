#!/usr/bin/env python
"""Text->video generation training entry point.

The reference has NO video-gen training code at all (SURVEY.md §2.7).  Two
phases: (1) 3D VQ-VAE reconstruction, (2) AR transformer next-token CE over
the VQ indices with text conditioning; synthetic mode offline.
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
    p.add_argument("--phase", default="both", choices=["vqvae", "transformer", "both"])
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from vats_tpu.configs.video_gen import video_gen_tiny_test
    from vats_tpu.train.video_gen import (
        VQVAE3DTrainer,
        VideoGenTrainingArgs,
        VideoTokenTrainer,
    )
    from vats_tpu.utils import setup_logger

    logger = setup_logger("training")
    cfg = video_gen_tiny_test()
    targs = VideoGenTrainingArgs()
    rng = np.random.RandomState(args.seed)
    pt, ph, pw = cfg.patch_size
    videos = jnp.asarray(
        rng.rand(args.batch_size, cfg.C_in_out, cfg.max_frames,
                 cfg.latent_height * ph, cfg.latent_width * pw),
        jnp.float32,
    )

    if args.phase in ("vqvae", "both"):
        trainer = VQVAE3DTrainer(cfg, targs, videos, num_training_steps=args.steps)
        for step in range(args.steps):
            loss = trainer.train_step(videos)
            if step % 10 == 0:
                logger.info("vqvae step %d loss=%.4f", step, loss)

    if args.phase in ("transformer", "both"):
        lat_t = cfg.max_frames // pt
        batch = {
            "indices": jnp.asarray(
                rng.randint(0, cfg.num_embeddings,
                            (args.batch_size, lat_t, cfg.latent_height,
                             cfg.latent_width)), jnp.int32),
            "text_embeddings": jnp.asarray(
                rng.randn(args.batch_size, 8, cfg.d_model), jnp.float32),
        }
        tok_trainer = VideoTokenTrainer(cfg, targs, batch,
                                        num_training_steps=args.steps)
        for step in range(args.steps):
            loss = tok_trainer.train_step(batch)
            if step % 10 == 0:
                logger.info("transformer step %d ce=%.4f", step, loss)
    logger.info("done")


if __name__ == "__main__":
    main()
