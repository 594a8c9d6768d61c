"""Vision augmentations (mixup / cutmix / random chooser) as pure JAX ops.

Mirrors /root/reference/src/transformers/vision/vit_2d/data_augmentation/
{mixup,cutmix,random}_augmentation.py.  All ops are jit-compatible (static
shapes, PRNG-key driven) so they run on-device inside the training step; the
reference applies them eagerly on the host.

Note: the reference's ``random_augmentation`` passes ``device`` positionally
into ``mixup_data``'s nonexistent 4th arg — a TypeError whenever mixup is
chosen (SURVEY.md §2.13.9).  The chooser here is correct.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mixup_data(
    rng: jax.Array,
    images: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Blend each image with a random partner: lam*x + (1-lam)*x[perm].

    Returns (mixed_images, targets_a, targets_b, lam[scalar]).
    """
    if alpha == 0:
        return images, targets, targets, jnp.float32(1.0)
    rng_lam, rng_perm = jax.random.split(rng)
    lam = jax.random.beta(rng_lam, alpha, alpha)
    index = jax.random.permutation(rng_perm, images.shape[0])
    mixed = lam * images + (1.0 - lam) * images[index]
    return mixed.astype(images.dtype), targets, targets[index], lam


def cutmix_data(
    rng: jax.Array,
    images: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Paste a random box from a partner image; lam = 1 - box_area/area.

    images: [B, C, H, W].  Static-shape: the box is realized as a boolean
    mask (the reference slices dynamically, cutmix_augmentation.py:57-66).
    """
    if alpha == 0:
        return images, targets, targets, jnp.float32(1.0)
    b, _, h, w = images.shape
    rng_lam, rng_perm, rng_cx, rng_cy = jax.random.split(rng, 4)
    lam0 = jax.random.beta(rng_lam, alpha, alpha)
    index = jax.random.permutation(rng_perm, b)

    cut_ratio = jnp.sqrt(1.0 - lam0)
    w_cut = (cut_ratio * w).astype(jnp.int32)
    h_cut = (cut_ratio * h).astype(jnp.int32)
    cx = jax.random.randint(rng_cx, (), 0, w)
    cy = jax.random.randint(rng_cy, (), 0, h)
    x1 = jnp.maximum(cx - w_cut // 2, 0)
    y1 = jnp.maximum(cy - h_cut // 2, 0)
    x2 = jnp.minimum(cx + w_cut // 2, w)
    y2 = jnp.minimum(cy + h_cut // 2, h)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    box = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)  # [H, W]
    mixed = jnp.where(box[None, None], images[index], images)

    area = (x2 - x1) * (y2 - y1)
    lam = 1.0 - area.astype(jnp.float32) / float(w * h)
    return mixed.astype(images.dtype), targets, targets[index], lam


def random_augmentation(
    rng: jax.Array,
    images: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float,
    cutmix_alpha: float = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniformly choose mixup / cutmix / none (reference chooser semantics)."""
    if cutmix_alpha is None:
        cutmix_alpha = alpha
    rng_choice, rng_aug = jax.random.split(rng)
    choice = jax.random.randint(rng_choice, (), 0, 3)
    mix = mixup_data(rng_aug, images, targets, alpha)
    cut = cutmix_data(rng_aug, images, targets, cutmix_alpha)
    none = (images, targets, targets, jnp.float32(1.0))

    def pick(i):
        return jax.tree_util.tree_map(
            lambda a, b, c: jnp.where(choice == 0, a, jnp.where(choice == 1, b, c)),
            mix[i],
            cut[i],
            none[i],
        )

    return pick(0), pick(1), pick(2), pick(3)
