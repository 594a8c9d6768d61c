"""Image generation stack tests: VQ-VAE, text encoder, AR transformer,
cached decode consistency, end-to-end generation, trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.configs.image_gen import image_gen_tiny_test
from vats_tpu.inference.image_generation import (
    ImageGenerationPipeline,
    ImageGenerationSampler,
    generate_image_tokens,
)
from vats_tpu.models.image_gen import (
    AutoregressiveImageTransformer,
    TransformerTextEncoder,
    VQVAE,
    VQVAEDecoder,
    VQVAEEncoder,
    VectorQuantizer,
)
from vats_tpu.train.image_gen import ImageGenTrainer, ImageGenTrainingArgs


CFG = image_gen_tiny_test(dtype="float32")


def test_vqvae_encoder_decoder_shapes():
    enc = VQVAEEncoder(CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    vars_e = enc.init(jax.random.PRNGKey(1), x)
    z = enc.apply(vars_e, x)
    assert z.shape == (2, 8, 8, CFG.d_model)  # 4x downsample

    dec = VQVAEDecoder(CFG)
    vars_d = dec.init(jax.random.PRNGKey(2), z)
    recon = dec.apply(vars_d, z)
    assert recon.shape == (2, 3, 32, 32)
    r = np.asarray(recon)
    assert (r >= 0).all() and (r <= 1).all()  # sigmoid output


def test_quantizer_ste_and_losses():
    vq = VectorQuantizer(CFG)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, CFG.d_model))
    params = vq.init(jax.random.PRNGKey(4), z)
    z_q, loss, idx = vq.apply(params, z)
    assert z_q.shape == z.shape
    assert idx.shape == (2, 4, 4)
    assert idx.min() >= 0 and idx.max() < CFG.num_embeddings
    assert float(loss) > 0
    # straight-through: dL/dz flows as if z_q == z
    g = jax.grad(lambda zz: jnp.sum(vq.apply(params, zz)[0] ** 2))(z)
    assert np.isfinite(np.asarray(g)).all()
    # quantized vectors are actual codebook rows
    cb = params["params"]["embedding"]
    cb = cb.value if hasattr(cb, "value") else cb
    z_q_direct = np.asarray(cb)[np.asarray(idx)]
    # (z_q after STE equals codebook rows numerically in forward)
    np.testing.assert_allclose(np.asarray(z_q), z_q_direct, rtol=1e-5, atol=1e-5)


def test_text_encoder_shapes_and_padding():
    enc = TransformerTextEncoder(CFG)
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 12), 0, CFG.vocab_size)
    mask = jnp.concatenate([jnp.ones((2, 8), bool), jnp.zeros((2, 4), bool)], 1)
    params = enc.init(jax.random.PRNGKey(6), ids)
    out = enc.apply(params, ids, padding_mask=mask)
    assert out.shape == (2, 12, CFG.d_model)
    # padded token content must not leak into valid positions
    ids2 = ids.at[:, 9:].set(7)
    out2 = enc.apply(params, ids2, padding_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out[:, :8]), np.asarray(out2[:, :8]), rtol=2e-3, atol=2e-4
    )


@pytest.fixture(scope="module")
def ar_model_and_params():
    model = AutoregressiveImageTransformer(CFG)
    idx = jnp.zeros((2, 4, 4), dtype=jnp.int32)
    text = jnp.zeros((2, 6, CFG.d_model))
    params = model.init(jax.random.PRNGKey(7), idx, text)
    return model, params


def test_ar_transformer_features_and_logits(ar_model_and_params):
    model, params = ar_model_and_params
    idx = jax.random.randint(jax.random.PRNGKey(8), (2, 4, 4), 0, CFG.num_embeddings)
    text = jax.random.normal(jax.random.PRNGKey(9), (2, 6, CFG.d_model))
    feats = model.apply(params, idx, text)
    assert feats.shape == (2, 4, 4, CFG.d_model)
    logits, _ = model.apply(params, idx, text, return_logits=True)
    assert logits.shape == (2, 16, CFG.num_embeddings)


@pytest.mark.slow
def test_ar_cached_decode_matches_full(ar_model_and_params):
    """Raster-order cached decode logits == full-forward logits."""
    model, params = ar_model_and_params
    idx = jax.random.randint(jax.random.PRNGKey(10), (1, 4, 4), 0, CFG.num_embeddings)
    text = jax.random.normal(jax.random.PRNGKey(11), (1, 6, CFG.d_model))
    full_logits, _ = model.apply(params, idx, text, return_logits=True)

    flat = idx.reshape(1, 16)
    cache = model.init_cache(1, 16)
    for i in range(16):
        step_logits, cache = model.apply(
            params,
            flat[:, i : i + 1],
            text,
            cache=cache,
            grid_w=4,
            return_logits=True,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, i]),
            rtol=2e-3,
            atol=2e-4,
        )


def test_generate_image_tokens_shapes(ar_model_and_params):
    model, params = ar_model_and_params
    text = jax.random.normal(jax.random.PRNGKey(12), (2, 6, CFG.d_model))
    tokens = generate_image_tokens(
        model, params, text, None, jax.random.PRNGKey(13),
        grid_h=4, grid_w=4, temperature=1.0, top_k=8, do_sample=True,
    )
    arr = np.asarray(tokens)
    assert arr.shape == (2, 4, 4)
    assert arr.min() >= 0 and arr.max() < CFG.num_embeddings


def test_greedy_image_tokens_deterministic(ar_model_and_params):
    model, params = ar_model_and_params
    text = jax.random.normal(jax.random.PRNGKey(14), (1, 6, CFG.d_model))
    t1 = generate_image_tokens(
        model, params, text, None, jax.random.PRNGKey(15),
        grid_h=4, grid_w=4, temperature=0.0, do_sample=False,
    )
    t2 = generate_image_tokens(
        model, params, text, None, jax.random.PRNGKey(16),
        grid_h=4, grid_w=4, temperature=0.0, do_sample=False,
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_vqvae_composite_forward():
    model = VQVAE(CFG)
    images = jax.random.uniform(jax.random.PRNGKey(17), (2, 3, 32, 32))
    text = jax.random.normal(jax.random.PRNGKey(18), (2, 6, CFG.d_model))
    img_mask = jnp.ones((2, 32 * 32), dtype=bool)
    txt_mask = jnp.ones((2, 6), dtype=bool)
    variables = model.init(jax.random.PRNGKey(19), images, text)
    recon, vq_loss, indices, t_out = model.apply(
        variables, images, text, img_mask, txt_mask
    )
    assert recon.shape == images.shape
    assert indices.shape == (2, 8, 8)
    assert t_out.shape == (2, 8, 8, CFG.d_model)
    assert float(vq_loss) > 0


def test_image_gen_trainer_reduces_loss():
    images = jax.random.uniform(jax.random.PRNGKey(20), (2, 3, 32, 32))
    text = jax.random.normal(jax.random.PRNGKey(21), (2, 6, CFG.d_model))
    batch = {"images": images, "text_embeddings": text}
    trainer = ImageGenTrainer(
        CFG,
        ImageGenTrainingArgs(grad_accum_steps=1, learning_rate=1e-3),
        num_training_steps=40,
        sample_batch=batch,
    )
    first = trainer.train_step(batch)
    for _ in range(20):
        last = trainer.train_step(batch)
    assert last["loss"] < first["loss"]
    assert np.isfinite(last["loss"])


def test_end_to_end_pipeline():
    rng = jax.random.PRNGKey(22)
    text_ids = jax.random.randint(rng, (1, 8), 1, CFG.vocab_size)
    enc = TransformerTextEncoder(CFG)
    enc_params = enc.init(jax.random.PRNGKey(23), text_ids)
    ar = AutoregressiveImageTransformer(CFG)
    ar_params = ar.init(
        jax.random.PRNGKey(24),
        jnp.zeros((1, 4, 4), jnp.int32),
        jnp.zeros((1, 8, CFG.d_model)),
    )
    dec = VQVAEDecoder(CFG)
    dec_params = dec.init(
        jax.random.PRNGKey(25), jnp.zeros((1, 4, 4, CFG.d_model))
    )
    codebook = jax.random.normal(
        jax.random.PRNGKey(26), (CFG.num_embeddings, CFG.d_model)
    )
    pipe = ImageGenerationPipeline(
        CFG, enc_params, ar_params, dec_params, codebook
    )
    images, tokens = pipe.generate_images(
        text_ids, jax.random.PRNGKey(27), grid_h=4, grid_w=4,
        sampler=ImageGenerationSampler(temperature=0.9, top_k=8, top_p=0.9),
    )
    assert images.shape == (1, 3, 16, 16)
    arr = np.asarray(images)
    assert (arr >= 0).all() and (arr <= 1).all()
    assert np.asarray(tokens).shape == (1, 4, 4)


def test_image_gen_trainer_evaluate():
    images = jax.random.uniform(jax.random.PRNGKey(30), (2, 3, 32, 32))
    text = jax.random.normal(jax.random.PRNGKey(31), (2, 6, CFG.d_model))
    batch = {"images": images, "text_embeddings": text}
    trainer = ImageGenTrainer(
        CFG, ImageGenTrainingArgs(grad_accum_steps=1), num_training_steps=10,
        sample_batch=batch,
    )
    metrics = trainer.evaluate(iter([batch, batch]), max_batches=2)
    assert metrics["batches"] == 2
    assert np.isfinite(metrics["loss"])


def test_paged_image_decode_matches_dense(ar_model_and_params):
    """North-star requirement: the image raster decode runs paged; the paged
    loop must reproduce the dense-cache loop token-for-token (greedy)."""
    from vats_tpu.inference.image_generation import generate_image_tokens_paged

    model, params = ar_model_and_params
    text = jax.random.normal(jax.random.PRNGKey(20), (2, 6, CFG.d_model))
    dense = generate_image_tokens(
        model, params, text, None, jax.random.PRNGKey(21),
        grid_h=4, grid_w=4, temperature=0.0, do_sample=False,
    )
    paged = generate_image_tokens_paged(
        model, params, text, None, jax.random.PRNGKey(22),
        grid_h=4, grid_w=4, temperature=0.0, do_sample=False, page_size=128,
    )
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(paged))
