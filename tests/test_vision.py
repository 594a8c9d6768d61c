"""ViT-2D and ViT-3D tests: shapes, masking invariants, augmentation, training.

Mirrors the reference's vision test batteries (shape/QKV checks,
tests/transformers/vision/vit_3d/attention_tests.py:43-63; edge-case frame
sweeps, model_tests.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.configs.vit2d import vit2d_xsmall
from vats_tpu.configs.vit3d import vit3d_tiny_test
from vats_tpu.data.augmentations import cutmix_data, mixup_data, random_augmentation
from vats_tpu.models.vit2d import ImageEncoder, resize_and_center_crop
from vats_tpu.models.vit3d import PatchEmbeddings3D, VideoTransformer
from vats_tpu.train.vision import (
    VisionTrainingArgs,
    create_vision_optimizer,
    make_vision_eval_step,
    make_vision_train_step,
    warmup_cosine_epoch_schedule,
)
from vats_tpu.train.state import create_train_state


# ---------------- ViT-2D ----------------


def test_resize_center_crop_shapes():
    x = jnp.ones((2, 3, 224, 384))
    out = resize_and_center_crop(x, 144)
    assert out.shape == (2, 3, 144, 144)
    out2 = resize_and_center_crop(jnp.ones((1, 3, 100, 100)), 64)
    assert out2.shape == (1, 3, 64, 64)


def test_vit2d_forward_features():
    cfg = vit2d_xsmall(dtype="float32")
    model = ImageEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 96, 80))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (2, cfg.num_patches, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()


def test_vit2d_classifier_head():
    cfg = vit2d_xsmall(dtype="float32", num_classes=10)
    model = ImageEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(3), x)
    out = model.apply(params, x)
    assert out.shape == (2, 10)


@pytest.mark.slow
def test_vit2d_gradients_finite():
    cfg = vit2d_xsmall(dtype="float32", num_classes=4)
    model = ImageEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(5), x)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


# ---------------- ViT-3D ----------------


def test_patch_embed_3d_shapes_and_mask():
    cfg = vit3d_tiny_test()
    pe = PatchEmbeddings3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 6, 40, 48))
    params = pe.init(jax.random.PRNGKey(7), x)
    out, mask, grid = pe.apply(params, x)
    gt, gh, gw = grid
    assert grid == (4, 4, 4)  # 8 frames (padded) / pt=2; 32/8 grid
    assert out.shape == (2, gt, gh * gw, cfg.d_model)
    assert mask.shape == (2, gt * gh * gw)
    # frames 0..5 real, 6..7 padded -> temporal cells 0,1,2 valid (any of
    # their 2 frames real), cell 3 (frames 6,7) invalid
    m = np.asarray(mask).reshape(2, gt, gh * gw)
    assert m[:, :3].all()
    assert not m[:, 3].any()


def test_patch_embed_3d_truncates_long_videos():
    cfg = vit3d_tiny_test()
    pe = PatchEmbeddings3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 3, 20, 32, 32))
    params = pe.init(jax.random.PRNGKey(9), x)
    out, mask, grid = pe.apply(params, x)
    assert grid[0] == cfg.max_frames // cfg.patch_size[0]
    assert np.asarray(mask).all()  # all kept frames real


def test_vit3d_forward_features_and_mask_isolation():
    cfg = vit3d_tiny_test()
    model = VideoTransformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 3, 6, 32, 32))
    params = model.init(jax.random.PRNGKey(11), x)
    out = model.apply(params, x)
    gt, gh, gw = cfg.grid_size
    assert out.shape == (2, gt * gh * gw, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()

    # padded-frame content must not affect valid-patch features
    x2 = x  # 6 real frames; frames 6-7 are zeros from padding either way
    x_longer = jnp.concatenate(
        [x, 99.0 * jnp.ones((2, 3, 2, 32, 32))], axis=2
    )  # 8 frames, last 2 garbage but marked invalid via frame_mask
    fm = jnp.concatenate(
        [jnp.ones((2, 6), bool), jnp.zeros((2, 2), bool)], axis=1
    )
    out2 = model.apply(params, x_longer, frame_mask=fm)
    n_valid = 3 * gh * gw  # first 3 temporal cells
    np.testing.assert_allclose(
        np.asarray(out[:, :n_valid]),
        np.asarray(out2[:, :n_valid]),
        rtol=2e-3,
        atol=2e-4,
    )


@pytest.mark.slow
def test_vit3d_classifier_head_and_training_step():
    cfg = vit3d_tiny_test(use_classifier_head=True)
    model = VideoTransformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 3, 8, 32, 32))
    params_v = model.init(jax.random.PRNGKey(13), x)
    logits = model.apply(params_v, x)
    assert logits.shape == (2, cfg.num_classes)

    args = VisionTrainingArgs(
        grad_accum_steps=1, use_augmentation=False, epochs=2, warmup_epochs=1
    )
    tx = create_vision_optimizer(args, steps_per_epoch=2)
    from vats_tpu.train.state import TrainState

    state = TrainState.create(
        apply_fn=model.apply,
        params=params_v["params"],
        tx=tx,
        tokens_seen=jnp.zeros((), jnp.int32),
        skipped_steps=jnp.zeros((), jnp.int32),
    )
    step = make_vision_train_step(model, args, cfg.num_classes)
    batch = {"images": x, "labels": jnp.array([1, 2])}
    state, m = step(state, batch, jax.random.PRNGKey(14))
    assert np.isfinite(float(m["loss"]))
    ev = make_vision_eval_step(model, cfg.num_classes)(state.params, batch)
    assert 0.0 <= float(ev["acc"]) <= 1.0


# ---------------- augmentations ----------------


def test_mixup_blends():
    rng = jax.random.PRNGKey(0)
    images = jnp.stack([jnp.zeros((3, 8, 8)), jnp.ones((3, 8, 8))])
    targets = jnp.array([0, 1])
    mixed, ta, tb, lam = mixup_data(rng, images, targets, alpha=0.8)
    assert mixed.shape == images.shape
    assert 0.0 <= float(lam) <= 1.0
    vals = np.unique(np.round(np.asarray(mixed), 5))
    assert len(vals) <= 2  # lam and 1-lam blends only


def test_mixup_alpha_zero_identity():
    rng = jax.random.PRNGKey(1)
    images = jax.random.normal(rng, (4, 3, 8, 8))
    targets = jnp.arange(4)
    mixed, ta, tb, lam = mixup_data(rng, images, targets, alpha=0)
    assert float(lam) == 1.0
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(images))


def test_cutmix_lambda_matches_box_area():
    rng = jax.random.PRNGKey(2)
    images = jax.random.normal(rng, (4, 3, 16, 16))
    targets = jnp.arange(4)
    mixed, ta, tb, lam = cutmix_data(rng, images, targets, alpha=1.0)
    # fraction of unchanged pixels should equal lam (box pasted from partner)
    changed = np.mean(
        np.any(np.asarray(mixed) != np.asarray(images), axis=(0, 1))
    )
    np.testing.assert_allclose(1.0 - changed, float(lam), atol=0.05)


def test_random_augmentation_runs():
    rng = jax.random.PRNGKey(3)
    images = jax.random.normal(rng, (4, 3, 8, 8))
    targets = jnp.arange(4)
    out = random_augmentation(rng, images, targets, alpha=0.8)
    assert out[0].shape == images.shape


def test_vision_schedule():
    sched = warmup_cosine_epoch_schedule(
        1.0, warmup_epochs=5, total_epochs=10, eta_min=0.01, steps_per_epoch=1
    )
    assert float(sched(0)) == pytest.approx(0.2)
    assert float(sched(4)) == pytest.approx(1.0)
    assert float(sched(9)) < float(sched(5))
