"""On-device pixel augmentations: AutoAugment (IMAGENET policy), random
rotation, random erasing — pure JAX, jit/vmap-friendly, static shapes.

TPU-first replacement for the reference's host-side torchvision transforms
(/root/reference/data/transformers/vision/vit_2d/setup_data.py:25-39:
RandomRotation(15), AutoAugment(IMAGENET), RandomErasing(p, scale, ratio)).
The reference augments eagerly on CPU workers, serializing the input
pipeline; here the whole battery runs inside the jitted train step on
[B, C, H, W] device arrays — geometric warps are gathers, photometric ops
are elementwise, and everything fuses with the step.

Conventions: images are float, RGB, range [0, 1], layout [B, C, H, W] (or
[C, H, W] for the per-image kernels, which are vmapped over B).  Op
semantics follow torchvision's tensor implementations (nearest resampling,
zero fill) so magnitudes mean the same thing.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# geometric warps (inverse-affine, nearest sampling, zero fill)
# ---------------------------------------------------------------------------


def _affine_nearest(img: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """Warp [C, H, W] by the inverse-affine 2x3 matrix ``inv`` mapping output
    (x, y) -> source (x, y), both relative to the image center.  Out-of-range
    samples fill with 0 (torchvision default)."""
    c, h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]
    sx = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2] + cx
    sy = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2] + cy
    ix = jnp.round(sx).astype(jnp.int32)
    iy = jnp.round(sy).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    out = img[:, iyc, ixc]  # [C, H, W] gather
    return jnp.where(valid[None], out, 0.0)


def _rotate(img: jnp.ndarray, degrees: jnp.ndarray) -> jnp.ndarray:
    # positive = counterclockwise (PIL/torchvision convention)
    rad = -degrees * (math.pi / 180.0)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) * 0.0
    inv = jnp.stack(
        [jnp.stack([cos, sin, 0.0 * cos]), jnp.stack([-sin, cos, 0.0 * cos])]
    )
    return _affine_nearest(img, inv)


def _shear_x(img: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    one, zero = jnp.float32(1.0), jnp.float32(0.0)
    inv = jnp.stack([jnp.stack([one, v, zero]), jnp.stack([zero, one, zero])])
    return _affine_nearest(img, inv)


def _shear_y(img: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    one, zero = jnp.float32(1.0), jnp.float32(0.0)
    inv = jnp.stack([jnp.stack([one, zero, zero]), jnp.stack([v, one, zero])])
    return _affine_nearest(img, inv)


def _translate_x(img: jnp.ndarray, frac: jnp.ndarray) -> jnp.ndarray:
    w = img.shape[2]
    one, zero = jnp.float32(1.0), jnp.float32(0.0)
    inv = jnp.stack(
        [jnp.stack([one, zero, -frac * w]), jnp.stack([zero, one, zero])]
    )
    return _affine_nearest(img, inv)


def _translate_y(img: jnp.ndarray, frac: jnp.ndarray) -> jnp.ndarray:
    h = img.shape[1]
    one, zero = jnp.float32(1.0), jnp.float32(0.0)
    inv = jnp.stack(
        [jnp.stack([one, zero, zero]), jnp.stack([zero, one, -frac * h])]
    )
    return _affine_nearest(img, inv)


# ---------------------------------------------------------------------------
# photometric ops (PIL/torchvision semantics on [0, 1] floats)
# ---------------------------------------------------------------------------


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[0], img[1], img[2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _blend(a: jnp.ndarray, b: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """PIL enhancer: factor 0 -> a (degenerate), 1 -> b (original)."""
    return jnp.clip(a + factor * (b - a), 0.0, 1.0)


def _color(img, factor):
    return _blend(jnp.broadcast_to(_grayscale(img)[None], img.shape), img, factor)


def _contrast(img, factor):
    mean = jnp.mean(jnp.round(_grayscale(img) * 255.0) / 255.0)
    return _blend(jnp.full_like(img, mean), img, factor)


def _brightness(img, factor):
    return _blend(jnp.zeros_like(img), img, factor)


def _sharpness(img, factor):
    # PIL SMOOTH kernel, borders kept from the original (torchvision parity)
    kern = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img[:, None],  # [C, 1, H, W] — depthwise via feature-dim 1
        kern[None, None],
        window_strides=(1, 1),
        padding="SAME",
    )[:, 0]
    h, w = img.shape[1], img.shape[2]
    interior = (
        (jnp.arange(h)[:, None] > 0)
        & (jnp.arange(h)[:, None] < h - 1)
        & (jnp.arange(w)[None, :] > 0)
        & (jnp.arange(w)[None, :] < w - 1)
    )
    smoothed = jnp.where(interior[None], smoothed, img)
    return _blend(smoothed, img, factor)


def _posterize(img, bits):
    """Keep the top ``bits`` bits of each 8-bit channel value."""
    x = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)
    shift = 8 - bits.astype(jnp.int32)
    x = (x >> shift) << shift
    return x.astype(img.dtype) / 255.0


def _solarize(img, threshold):
    return jnp.where(img >= threshold, 1.0 - img, img)


def _invert(img, _):
    return 1.0 - img


def _autocontrast(img, _):
    lo = jnp.min(img, axis=(1, 2), keepdims=True)
    hi = jnp.max(img, axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / jnp.maximum(hi - lo, 1e-12), 1.0)
    off = jnp.where(hi > lo, lo, 0.0)
    return jnp.clip((img - off) * scale, 0.0, 1.0)


def _equalize_channel(ch: jnp.ndarray) -> jnp.ndarray:
    """torchvision _scale_channel on one [H, W] plane."""
    x = jnp.clip(jnp.round(ch * 255.0), 0, 255).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.int32).at[x.reshape(-1)].add(1)
    # count of the last nonzero bin (static-shape replacement for
    # hist[hist != 0][-1])
    idx_last = 255 - jnp.argmax((hist > 0)[::-1])
    last_count = hist[idx_last]
    total = x.size
    step = (total - last_count) // 255
    lut = (jnp.cumsum(hist) + step // 2) // jnp.maximum(step, 1)
    lut = jnp.clip(jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]]), 0, 255)
    eq = lut[x].astype(ch.dtype) / 255.0
    return jnp.where(step == 0, ch, eq)


def _equalize(img, _):
    return jax.vmap(_equalize_channel)(img)


def _identity(img, _):
    return img


# ---------------------------------------------------------------------------
# AutoAugment, IMAGENET policy
# ---------------------------------------------------------------------------

# op table: id -> kernel(img, magnitude)
_OPS = (
    _identity,      # 0
    _shear_x,       # 1
    _shear_y,       # 2
    _translate_x,   # 3
    _translate_y,   # 4
    _rotate,        # 5
    _color,         # 6
    _posterize,     # 7
    _solarize,      # 8
    _contrast,      # 9
    _sharpness,     # 10
    _brightness,    # 11
    _autocontrast,  # 12
    _equalize,      # 13
    _invert,        # 14
)
_OP_ID = {
    "Identity": 0, "ShearX": 1, "ShearY": 2, "TranslateX": 3, "TranslateY": 4,
    "Rotate": 5, "Color": 6, "Posterize": 7, "Solarize": 8, "Contrast": 9,
    "Sharpness": 10, "Brightness": 11, "AutoContrast": 12, "Equalize": 13,
    "Invert": 14,
}
_SIGNED = {"ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
           "Color", "Contrast", "Sharpness", "Brightness"}


def _magnitude(name: str, idx) -> float:
    """torchvision magnitude spaces (10 bins), resolved to kernel units."""
    if idx is None:
        return 0.0
    if name in ("ShearX", "ShearY"):
        return float(np.linspace(0.0, 0.3, 10)[idx])
    if name in ("TranslateX", "TranslateY"):
        return float(np.linspace(0.0, 150.0 / 331.0, 10)[idx])
    if name == "Rotate":
        return float(np.linspace(0.0, 30.0, 10)[idx])
    if name in ("Color", "Contrast", "Sharpness", "Brightness"):
        # enhancer factor = 1 + sign * m
        return float(np.linspace(0.0, 0.9, 10)[idx])
    if name == "Posterize":
        # torchvision _augmentation_space: 8 - round(idx * 4 / 9) bits
        return float(8 - int(round(idx * 4 / 9)))
    if name == "Solarize":
        return float(np.linspace(255.0, 0.0, 10)[idx] / 255.0)
    return 0.0


# the 25 (op, p, magnitude_idx) pairs of torchvision's IMAGENET policy
_IMAGENET_POLICY = (
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Equalize", 0.4, None), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, None)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, None)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, None), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, None)),
    (("Equalize", 0.0, None), ("Equalize", 0.8, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, None)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, None)),
    (("Color", 0.4, 0), ("Equalize", 0.6, None)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
)

# policy as static device constants: [25, 2] each
_P_OP = np.array(
    [[_OP_ID[s[0]] for s in sp] for sp in _IMAGENET_POLICY], np.int32
)
_P_PROB = np.array([[s[1] for s in sp] for sp in _IMAGENET_POLICY], np.float32)
_P_MAG = np.array(
    [[_magnitude(s[0], s[2]) for s in sp] for sp in _IMAGENET_POLICY],
    np.float32,
)
_P_SIGNED = np.array(
    [[1.0 if s[0] in _SIGNED else 0.0 for s in sp] for sp in _IMAGENET_POLICY],
    np.float32,
)
# enhancer ops map magnitude m -> factor 1 + sign*m
_P_ENHANCER = np.array(
    [[1.0 if s[0] in ("Color", "Contrast", "Sharpness", "Brightness") else 0.0
      for s in sp] for sp in _IMAGENET_POLICY],
    np.float32,
)


def _apply_policy_stage(img, op_id, mag):
    return jax.lax.switch(op_id, list(_OPS), img, mag)


def autoaugment_imagenet(rng: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """AutoAugment (IMAGENET policy) on a batch [B, C, H, W] in [0, 1].

    Per image: draw one of 25 sub-policies, then for each of its two stages
    independently decide (by the stage's probability) whether to apply the op,
    with a random sign on signed magnitudes — torchvision
    AutoAugment.forward semantics, vectorized with vmap + lax.switch."""
    p_op = jnp.asarray(_P_OP)
    p_prob = jnp.asarray(_P_PROB)
    p_mag = jnp.asarray(_P_MAG)
    p_signed = jnp.asarray(_P_SIGNED)
    p_enh = jnp.asarray(_P_ENHANCER)

    def one(rng, img):
        r_sp, r_u, r_sign = jax.random.split(rng, 3)
        sp = jax.random.randint(r_sp, (), 0, p_op.shape[0])
        us = jax.random.uniform(r_u, (2,))
        signs = jnp.where(
            jax.random.bernoulli(r_sign, 0.5, (2,)), 1.0, -1.0
        )
        for stage in range(2):
            op_id = p_op[sp, stage]
            m = p_mag[sp, stage]
            sign = jnp.where(p_signed[sp, stage] > 0, signs[stage], 1.0)
            m = jnp.where(
                p_enh[sp, stage] > 0, 1.0 + sign * m, sign * m
            )
            applied = _apply_policy_stage(img, op_id, m)
            img = jnp.where(us[stage] < p_prob[sp, stage], applied, img)
        return img

    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(one)(rngs, images.astype(jnp.float32)).astype(images.dtype)


# ---------------------------------------------------------------------------
# RandomRotation / RandomErasing
# ---------------------------------------------------------------------------


def random_rotation(
    rng: jax.Array, images: jnp.ndarray, degrees: float = 15.0
) -> jnp.ndarray:
    """Rotate each image by U(-degrees, degrees) about its center
    (torchvision RandomRotation, nearest, zero fill)."""
    angles = jax.random.uniform(
        rng, (images.shape[0],), minval=-degrees, maxval=degrees
    )
    return jax.vmap(_rotate)(
        images.astype(jnp.float32), angles
    ).astype(images.dtype)


def random_erasing(
    rng: jax.Array,
    images: jnp.ndarray,
    p: float = 0.4,
    scale: Tuple[float, float] = (0.02, 0.33),
    ratio: Tuple[float, float] = (0.3, 3.3),
    value: float = 0.0,
) -> jnp.ndarray:
    """torchvision RandomErasing: with prob p, zero a random box whose area
    is U(scale) of the image and aspect ratio exp(U(log ratio)).

    Static-shape variant: the box is drawn unconditionally and realized as a
    mask (clamped to the image); rejected draws (torchvision retries up to 10
    times) are instead clamped, which only matters at extreme ratios."""
    b, _, h, w = images.shape
    r_apply, r_area, r_ratio, r_x, r_y = jax.random.split(rng, 5)
    apply = jax.random.bernoulli(r_apply, p, (b,))
    area = jax.random.uniform(
        r_area, (b,), minval=scale[0], maxval=scale[1]
    ) * (h * w)
    log_r = jax.random.uniform(
        r_ratio, (b,), minval=math.log(ratio[0]), maxval=math.log(ratio[1])
    )
    aspect = jnp.exp(log_r)
    eh = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, w).astype(jnp.int32)
    y0 = (jax.random.uniform(r_y, (b,)) * (h - eh + 1)).astype(jnp.int32)
    x0 = (jax.random.uniform(r_x, (b,)) * (w - ew + 1)).astype(jnp.int32)
    ys = jnp.arange(h)[None, :, None]  # [1, H, 1]
    xs = jnp.arange(w)[None, None, :]  # [1, 1, W]
    box = (
        (ys >= y0[:, None, None]) & (ys < (y0 + eh)[:, None, None])
        & (xs >= x0[:, None, None]) & (xs < (x0 + ew)[:, None, None])
    )  # [B, H, W]
    box = box & apply[:, None, None]
    return jnp.where(box[:, None], jnp.asarray(value, images.dtype), images)
