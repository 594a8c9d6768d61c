"""On-device pixel augmentation battery vs PIL oracles.

The deterministic photometric/geometric kernels are checked against
PIL.ImageOps / ImageEnhance on the same uint8 images — PIL is the original
definition of these ops (torchvision's AutoAugment replicates PIL; reference
transform battery: vit_2d/setup_data.py:25-39).  The stochastic wrappers
(AutoAugment / RandomRotation / RandomErasing) are checked for
shape/range/coverage invariants under jit.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

PIL = pytest.importorskip("PIL")
from PIL import Image, ImageEnhance, ImageFilter, ImageOps  # noqa: E402

from vats_tpu.data import pixel_augs as PA  # noqa: E402


def _rand_img(seed=0, h=32, w=32):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(3, h, w), dtype=np.uint8)


def _as_jax(u8):
    return jnp.asarray(u8.astype(np.float32) / 255.0)


def _as_pil(u8):
    return Image.fromarray(u8.transpose(1, 2, 0), mode="RGB")


def _from_pil(img):
    return np.asarray(img).transpose(2, 0, 1)


def _to_u8(x):
    return np.clip(np.round(np.asarray(x) * 255.0), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("bits", [1, 3, 4, 6, 7])
def test_posterize_matches_pil(bits):
    u8 = _rand_img(1)
    ours = _to_u8(PA._posterize(_as_jax(u8), jnp.int32(bits)))
    ref = _from_pil(ImageOps.posterize(_as_pil(u8), bits))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("thresh", [0, 64, 128, 192])
def test_solarize_matches_pil(thresh):
    u8 = _rand_img(2)
    ours = _to_u8(PA._solarize(_as_jax(u8), jnp.float32(thresh / 255.0)))
    ref = _from_pil(ImageOps.solarize(_as_pil(u8), thresh))
    np.testing.assert_allclose(ours.astype(int), ref.astype(int), atol=1)


def test_invert_matches_pil():
    u8 = _rand_img(3)
    ours = _to_u8(PA._invert(_as_jax(u8), 0.0))
    ref = _from_pil(ImageOps.invert(_as_pil(u8)))
    np.testing.assert_array_equal(ours, ref)


def test_autocontrast_matches_pil():
    u8 = _rand_img(4)
    ours = _to_u8(PA._autocontrast(_as_jax(u8), 0.0))
    ref = _from_pil(ImageOps.autocontrast(_as_pil(u8)))
    np.testing.assert_allclose(ours.astype(int), ref.astype(int), atol=1)


def test_equalize_matches_pil():
    u8 = _rand_img(5)
    ours = _to_u8(PA._equalize(_as_jax(u8), 0.0))
    ref = _from_pil(ImageOps.equalize(_as_pil(u8)))
    np.testing.assert_allclose(ours.astype(int), ref.astype(int), atol=1)


@pytest.mark.parametrize("factor", [0.1, 0.55, 1.0, 1.9])
def test_brightness_matches_pil(factor):
    u8 = _rand_img(6)
    ours = _to_u8(PA._brightness(_as_jax(u8), jnp.float32(factor)))
    ref = _from_pil(ImageEnhance.Brightness(_as_pil(u8)).enhance(factor))
    np.testing.assert_allclose(ours.astype(int), ref.astype(int), atol=1)


@pytest.mark.parametrize("factor", [0.1, 1.0, 1.9])
def test_saturation_matches_pil(factor):
    u8 = _rand_img(7)
    ours = _to_u8(PA._color(_as_jax(u8), jnp.float32(factor)))
    ref = _from_pil(ImageEnhance.Color(_as_pil(u8)).enhance(factor))
    np.testing.assert_allclose(ours.astype(int), ref.astype(int), atol=2)


@pytest.mark.parametrize("factor", [0.1, 1.0, 1.9])
def test_contrast_matches_pil(factor):
    u8 = _rand_img(8)
    ours = _to_u8(PA._contrast(_as_jax(u8), jnp.float32(factor)))
    ref = _from_pil(ImageEnhance.Contrast(_as_pil(u8)).enhance(factor))
    np.testing.assert_allclose(ours.astype(int), ref.astype(int), atol=3)


@pytest.mark.parametrize("factor", [0.0, 1.0, 2.0])
def test_sharpness_matches_pil(factor):
    u8 = _rand_img(9)
    ours = _to_u8(PA._sharpness(_as_jax(u8), jnp.float32(factor)))
    ref = _from_pil(ImageEnhance.Sharpness(_as_pil(u8)).enhance(factor))
    # PIL's SMOOTH uses integer rounding per pixel; compare interiors tightly
    np.testing.assert_allclose(
        ours[:, 1:-1, 1:-1].astype(int), ref[:, 1:-1, 1:-1].astype(int),
        atol=2,
    )
    # borders are passed through unfiltered on both sides
    np.testing.assert_allclose(
        ours[:, 0].astype(int), ref[:, 0].astype(int), atol=2
    )


@pytest.mark.parametrize("angle", [-30.0, 15.0, 90.0])
def test_rotate_matches_pil(angle):
    u8 = _rand_img(10)
    ours = _to_u8(PA._rotate(_as_jax(u8), jnp.float32(angle)))
    ref = _from_pil(
        _as_pil(u8).rotate(angle, resample=Image.NEAREST, fillcolor=(0, 0, 0))
    )
    mismatch = (ours != ref).mean()
    # nearest-neighbor rounding at half-pixel centers differs along edges
    assert mismatch < 0.25, f"rotate mismatch fraction {mismatch}"


def test_rotate_90_exact():
    u8 = _rand_img(12, h=33, w=33)  # odd size: unambiguous center
    ours = _to_u8(PA._rotate(_as_jax(u8), jnp.float32(90.0)))
    ref = _from_pil(_as_pil(u8).rotate(90.0, resample=Image.NEAREST))
    np.testing.assert_array_equal(ours, ref)


def test_translate_shifts_pixels():
    u8 = _rand_img(11)
    img = _as_jax(u8)
    out = PA._translate_x(img, jnp.float32(0.25))  # shift right 8 of 32 px
    np.testing.assert_allclose(
        np.asarray(out[:, :, 8:]), np.asarray(img[:, :, :-8]), atol=1e-6
    )
    assert float(jnp.abs(out[:, :, :8]).max()) == 0.0


def test_autoaugment_batch_invariants():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(8, 3, 32, 32).astype(np.float32))
    out = jax.jit(PA.autoaugment_imagenet)(jax.random.PRNGKey(0), images)
    assert out.shape == images.shape and out.dtype == images.dtype
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
    # different keys produce different augmentations
    out2 = jax.jit(PA.autoaugment_imagenet)(jax.random.PRNGKey(7), images)
    assert not np.allclose(np.asarray(out2), o)


def test_random_rotation_batch():
    images = jnp.ones((4, 3, 16, 16), jnp.float32)
    out = jax.jit(PA.random_rotation)(jax.random.PRNGKey(0), images)
    assert out.shape == images.shape
    # rotation of a constant image only introduces zero-fill corners
    vals = np.unique(np.round(np.asarray(out), 5))
    assert set(vals).issubset({0.0, 1.0})


def test_random_erasing_zeroes_box():
    images = jnp.ones((16, 3, 32, 32), jnp.float32)
    out = jax.jit(lambda r, x: PA.random_erasing(r, x, p=1.0))(
        jax.random.PRNGKey(0), images
    )
    o = np.asarray(out)
    frac = (o == 0).reshape(16, -1).mean(axis=1)
    # every image got a box covering ~2-33% of pixels
    assert (frac > 0.0).all() and (frac < 0.5).all()
    # p=0 leaves images untouched
    out0 = PA.random_erasing(jax.random.PRNGKey(0), images, p=0.0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(images))


@pytest.mark.slow
def test_vision_train_step_with_on_device_pixel_augs():
    """Full jitted step at tiny shapes with the battery enabled."""
    from vats_tpu.configs.vit2d import vit2d_xsmall
    from vats_tpu.models.vit2d import ImageEncoder
    from vats_tpu.train.state import TrainState
    from vats_tpu.train.vision import (
        VisionTrainingArgs,
        create_vision_optimizer,
        make_vision_train_step,
    )

    cfg = vit2d_xsmall(target_size=16, patch_size=8, num_classes=10)
    model = ImageEncoder(cfg)
    args = VisionTrainingArgs(
        grad_accum_steps=1, pixel_augs_on_device=True, epochs=2,
        warmup_epochs=1,
    )
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (4, 3, 16, 16))  # RAW [0,1]
    labels = jnp.zeros((4,), jnp.int32)
    tx = create_vision_optimizer(args, steps_per_epoch=2)
    variables = model.init(rng, images)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    step = make_vision_train_step(model, args, cfg.num_classes)
    state, metrics = step(state, {"images": images, "labels": labels}, rng)
    assert np.isfinite(float(metrics["loss"]))
