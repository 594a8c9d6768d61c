"""Edge-case sweeps mirroring the reference's batteries (SURVEY.md §4):
variable batch sizes/dtypes, float token ids, oversized inputs, bf16 mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.configs import ModelArgs
from vats_tpu.configs.vit3d import vit3d_tiny_test
from vats_tpu.models import TextLM
from vats_tpu.models.vit3d import VideoTransformer


def tiny(**kw):
    base = dict(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        dropout=0.0, vocab_size=97, max_seq_len=32, left_window=-1,
        dtype="float32", gradient_checkpointing=False,
    )
    base.update(kw)
    return ModelArgs(**base)


@pytest.mark.parametrize("batch", [1, 3, 8])
def test_variable_batch_sizes(batch):
    model = TextLM(tiny())
    ids = jax.random.randint(jax.random.PRNGKey(0), (batch, 8), 0, 97)
    params = model.init(jax.random.PRNGKey(1), ids)
    logits, _, _ = model.apply(params, ids)
    assert logits.shape == (batch, 8, 97)


def test_float_input_ids_are_cast():
    """The reference casts non-int64 ids (model.py:242-243); we cast to int32."""
    model = TextLM(tiny())
    ids_f = jnp.asarray([[1.0, 5.0, 9.0, 2.0]], jnp.float32)
    params = model.init(jax.random.PRNGKey(2), ids_f.astype(jnp.int32))
    logits, _, _ = model.apply(params, ids_f)
    assert np.isfinite(np.asarray(logits)).all()


def test_bf16_model_forward_finite():
    model = TextLM(tiny(dtype="bfloat16"))
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 97)
    params = model.init(jax.random.PRNGKey(4), ids)
    logits, _, _ = model.apply(params, ids)
    assert logits.dtype == jnp.float32  # logits promoted for the loss
    assert np.isfinite(np.asarray(logits)).all()


def test_sequence_longer_than_training_context_still_runs():
    """Uncached forward has no hard length cap (RoPE is position-generic)."""
    model = TextLM(tiny(max_seq_len=16))
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 24), 0, 97)
    params = model.init(jax.random.PRNGKey(6), ids[:, :8])
    logits, _, _ = model.apply(params, ids)
    assert logits.shape == (1, 24, 97)


@pytest.mark.slow
def test_vit3d_more_frames_than_max_truncates():
    cfg = vit3d_tiny_test()
    model = VideoTransformer(cfg)
    x_long = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 20, 32, 32))
    params = model.init(jax.random.PRNGKey(8), x_long)
    out = model.apply(params, x_long)
    gt, gh, gw = cfg.grid_size
    assert out.shape == (1, gt * gh * gw, cfg.d_model)


@pytest.mark.slow
def test_vit3d_single_frame_batch_of_one():
    cfg = vit3d_tiny_test()
    model = VideoTransformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 1, 32, 32))
    params = model.init(jax.random.PRNGKey(10), x)
    out = model.apply(params, x)  # padded up to max_frames, mask covers pads
    assert np.isfinite(np.asarray(out)).all()


def test_fully_padded_row_does_not_nan():
    """A row of all padding must not poison other rows (masked softmax guard)."""
    model = TextLM(tiny())
    ids = jax.random.randint(jax.random.PRNGKey(11), (2, 8), 1, 97)
    mask = jnp.asarray([[True] * 8, [False] * 8])
    params = model.init(jax.random.PRNGKey(12), ids)
    logits, _, _ = model.apply(params, ids, padding_mask=mask)
    assert np.isfinite(np.asarray(logits[0])).all()
