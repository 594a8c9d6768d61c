"""Video generation stack tests: factorized attention, 3D VQ-VAE, temporal
cache consistency, end-to-end generation, trainers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.configs.video_gen import video_gen_tiny_test
from vats_tpu.inference.video_generation import (
    VideoGenerationPipeline,
    VideoGenerationSampler,
    generate_video_tokens,
)
from vats_tpu.models.video_gen import (
    AutoregressiveVideoTransformer,
    Decoder3D,
    Encoder3D,
    VQVAE3D,
)
from vats_tpu.train.video_gen import (
    VQVAE3DTrainer,
    VideoGenTrainingArgs,
    VideoTokenTrainer,
)

CFG = video_gen_tiny_test(dtype="float32")
GH, GW = CFG.latent_height, CFG.latent_width
LAT_T = CFG.max_frames // CFG.patch_size[0]


@pytest.fixture(scope="module")
def model_and_params():
    model = AutoregressiveVideoTransformer(CFG)
    idx = jnp.zeros((1, LAT_T, GH, GW), dtype=jnp.int32)
    text = jnp.zeros((1, 5, CFG.d_model))
    params = model.init(jax.random.PRNGKey(0), idx, text)
    return model, params


def test_transformer_features_and_logits(model_and_params):
    model, params = model_and_params
    idx = jax.random.randint(
        jax.random.PRNGKey(1), (2, LAT_T, GH, GW), 0, CFG.num_embeddings
    )
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 5, CFG.d_model))
    feats = model.apply(params, idx, text)
    assert feats.shape == (2, LAT_T, GH, GW, CFG.d_model)
    logits, _ = model.apply(params, idx, text, return_logits=True)
    assert logits.shape == (2, LAT_T, GH * GW, CFG.num_embeddings)
    assert np.isfinite(np.asarray(logits)).all()


def test_temporal_causality(model_and_params):
    """Changing a later frame must not affect earlier frames' logits."""
    model, params = model_and_params
    idx = jax.random.randint(
        jax.random.PRNGKey(3), (1, LAT_T, GH, GW), 0, CFG.num_embeddings
    )
    text = jax.random.normal(jax.random.PRNGKey(4), (1, 5, CFG.d_model))
    l1, _ = model.apply(params, idx, text, return_logits=True)
    idx2 = idx.at[:, -1].set((idx[:, -1] + 1) % CFG.num_embeddings)
    l2, _ = model.apply(params, idx2, text, return_logits=True)
    np.testing.assert_allclose(
        np.asarray(l1[:, : LAT_T - 1]),
        np.asarray(l2[:, : LAT_T - 1]),
        rtol=2e-3,
        atol=2e-4,
    )


@pytest.mark.slow
def test_spatial_causality_within_frame(model_and_params):
    """Changing a later raster position must not affect earlier positions."""
    model, params = model_and_params
    idx = jax.random.randint(
        jax.random.PRNGKey(5), (1, 1, GH, GW), 0, CFG.num_embeddings
    )
    text = jax.random.normal(jax.random.PRNGKey(6), (1, 5, CFG.d_model))
    l1, _ = model.apply(params, idx, text, return_logits=True)
    flat = idx.reshape(1, GH * GW)
    flat2 = flat.at[:, -1].set((flat[:, -1] + 1) % CFG.num_embeddings)
    l2, _ = model.apply(
        params, flat2.reshape(1, 1, GH, GW), text, return_logits=True
    )
    np.testing.assert_allclose(
        np.asarray(l1[:, 0, : GH * GW - 1]),
        np.asarray(l2[:, 0, : GH * GW - 1]),
        rtol=2e-3,
        atol=2e-4,
    )


def test_temporal_cached_decode_matches_full(model_and_params):
    """Frame-by-frame cached forward == full-sequence forward logits."""
    model, params = model_and_params
    idx = jax.random.randint(
        jax.random.PRNGKey(7), (1, LAT_T, GH, GW), 0, CFG.num_embeddings
    )
    text = jax.random.normal(jax.random.PRNGKey(8), (1, 5, CFG.d_model))
    full, _ = model.apply(params, idx, text, return_logits=True)

    cache = model.init_cache(1)
    for f in range(LAT_T):
        logits_f, cache = model.apply(
            params,
            idx[:, f : f + 1],
            text,
            cache=cache,
            cache_mode="append",
            return_logits=True,
        )
        np.testing.assert_allclose(
            np.asarray(logits_f[:, 0]),
            np.asarray(full[:, f]),
            rtol=2e-3,
            atol=2e-4,
        )


def test_cache_read_mode_does_not_persist(model_and_params):
    model, params = model_and_params
    idx = jax.random.randint(
        jax.random.PRNGKey(9), (1, 1, GH, GW), 0, CFG.num_embeddings
    )
    text = jax.random.normal(jax.random.PRNGKey(10), (1, 5, CFG.d_model))
    cache = model.init_cache(1)
    _, cache_read = model.apply(
        params, idx, text, cache=cache, cache_mode="read", return_logits=True
    )
    assert int(cache_read.length) == 0
    _, cache_app = model.apply(
        params, idx, text, cache=cache, cache_mode="append", return_logits=True
    )
    assert int(cache_app.length) == 1


def test_generate_video_tokens(model_and_params):
    model, params = model_and_params
    text = jax.random.normal(jax.random.PRNGKey(11), (1, 5, CFG.d_model))
    tokens = generate_video_tokens(
        model, params, text, None, jax.random.PRNGKey(12),
        num_frames=2, temperature=1.0, top_k=8, do_sample=True,
    )
    arr = np.asarray(tokens)
    assert arr.shape == (1, 2, GH, GW)
    assert arr.min() >= 0 and arr.max() < CFG.num_embeddings


def test_vqvae3d_roundtrip_shapes():
    model = VQVAE3D(CFG)
    x = jax.random.uniform(jax.random.PRNGKey(13), (1, 3, 4, 16, 16))
    variables = model.init(jax.random.PRNGKey(14), x)
    recon, loss, indices = model.apply(variables, x)
    assert recon.shape == x.shape
    assert float(loss) > 0
    pt, ph, pw = CFG.patch_size
    assert indices.shape == (1, 4 // pt, 16 // ph, 16 // pw)
    r = np.asarray(recon)
    assert (r >= 0).all() and (r <= 1).all()


def test_vqvae3d_trainer_reduces_loss():
    videos = jax.random.uniform(jax.random.PRNGKey(15), (2, 3, 4, 16, 16))
    trainer = VQVAE3DTrainer(
        CFG, VideoGenTrainingArgs(learning_rate=1e-3), videos,
        num_training_steps=30,
    )
    first = trainer.train_step(videos)
    for _ in range(15):
        last = trainer.train_step(videos)
    assert last < first


def test_video_token_trainer_reduces_loss():
    idx = jax.random.randint(
        jax.random.PRNGKey(16), (2, LAT_T, GH, GW), 0, CFG.num_embeddings
    )
    text = jax.random.normal(jax.random.PRNGKey(17), (2, 5, CFG.d_model))
    batch = {"indices": idx, "text_embeddings": text}
    trainer = VideoTokenTrainer(
        CFG, VideoGenTrainingArgs(learning_rate=3e-3), batch,
        num_training_steps=40,
    )
    first = trainer.train_step(batch)
    for _ in range(25):
        last = trainer.train_step(batch)
    assert last < first


def test_end_to_end_video_pipeline():
    from vats_tpu.configs.image_gen import image_gen_tiny_test
    from vats_tpu.models.image_gen import TransformerTextEncoder

    # text encoder reused from the image-gen stack with matching d_model
    txt_cfg = image_gen_tiny_test(
        d_model=CFG.d_model, num_heads=4, query_groups=2, d_ffn=96,
        vocab_size=CFG.vocab_size, dtype="float32",
    )
    enc = TransformerTextEncoder(txt_cfg)
    text_ids = jax.random.randint(jax.random.PRNGKey(18), (1, 5), 1, CFG.vocab_size)
    enc_params = enc.init(jax.random.PRNGKey(19), text_ids)

    ar = AutoregressiveVideoTransformer(CFG)
    ar_params = ar.init(
        jax.random.PRNGKey(20),
        jnp.zeros((1, 1, GH, GW), jnp.int32),
        jnp.zeros((1, 5, CFG.d_model)),
    )
    dec = Decoder3D(CFG)
    dec_params = dec.init(
        jax.random.PRNGKey(21), jnp.zeros((1, 2, GH, GW, CFG.d_model))
    )
    codebook = jax.random.normal(
        jax.random.PRNGKey(22), (CFG.num_embeddings, CFG.d_model)
    )
    pipe = VideoGenerationPipeline(
        CFG, enc, enc_params, ar_params, dec_params, codebook
    )
    videos, tokens = pipe.generate_videos(
        text_ids, jax.random.PRNGKey(23), num_frames=2,
        sampler=VideoGenerationSampler(temperature=0.9, top_k=8),
    )
    pt, ph, pw = CFG.patch_size
    assert videos.shape == (1, 3, 2 * pt, GH * ph, GW * pw)
    arr = np.asarray(videos)
    assert (arr >= 0).all() and (arr <= 1).all()
