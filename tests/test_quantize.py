"""Weight-only int8 serving: quantization numerics and decode parity.

The reference has no quantized path; parity is guarded against this repo's
own fp32 decode (tests/test_generate.py's oracle-verified loop)."""

import jax
import jax.numpy as jnp
import numpy as np

from vats_tpu.configs import ModelArgs
from vats_tpu.inference import generate
from vats_tpu.inference.quantize import (
    QuantizedModel,
    dequantize_params,
    quantize_params,
    quantize_tensor,
    quantized_bytes,
)
from vats_tpu.models import TextLM


def tiny_args(**kw):
    base = dict(
        d_model=64,
        num_heads=4,
        query_groups=2,
        d_ffn=128,
        num_layers=2,
        dropout=0.0,
        vocab_size=97,
        max_seq_len=48,
        left_window=-1,
        num_experts=2,
        top_k=1,
        dtype="float32",
        gradient_checkpointing=False,
        max_batch_size=8,
    )
    base.update(kw)
    return ModelArgs(**base)


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128)) * 0.02
    q = quantize_tensor(w)
    assert q.qvalue.dtype == jnp.int8
    assert q.scale.shape == (1, 128)
    back = np.asarray(q.qvalue.astype(jnp.float32) * q.scale)
    # per-channel symmetric int8: error bounded by scale/2 per element
    err = np.abs(back - np.asarray(w))
    bound = np.asarray(q.scale) / 2 + 1e-8
    assert (err <= bound).all()


def test_quantize_params_selective():
    # only large (>= min_size) float matrices quantize; norms/biases stay
    params = {
        "kernel": jnp.ones((64, 64), jnp.float32),
        "norm_scale": jnp.ones((64,), jnp.float32),
        "step": jnp.zeros((), jnp.int32),
    }
    q = quantize_params(params, min_size=1024)
    assert q["kernel"].qvalue.dtype == jnp.int8
    assert q["norm_scale"].dtype == jnp.float32
    assert q["step"].dtype == jnp.int32
    small = quantize_params(params, min_size=1 << 30)
    assert small["kernel"].dtype == jnp.float32
    # int8 + fp32 scales is ~4x smaller than fp32
    assert quantized_bytes(q) < 0.3 * quantized_bytes(params)


def test_dequantize_matches_structure():
    args = tiny_args()
    model = TextLM(args)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), ids)
    q = quantize_params(params, min_size=1)
    deq = dequantize_params(q, jnp.float32)
    assert (
        jax.tree_util.tree_structure(deq)
        == jax.tree_util.tree_structure(params)
    )
    # forward through dequantized params is close to the fp32 forward
    logits, _, _ = model.apply(params, ids)
    logits_q, _, _ = model.apply(deq, ids)
    cos = np.dot(
        np.asarray(logits).ravel(), np.asarray(logits_q).ravel()
    ) / (
        np.linalg.norm(np.asarray(logits)) * np.linalg.norm(np.asarray(logits_q))
    )
    assert cos > 0.999


def test_quantized_greedy_decode_close_to_fp32():
    args = tiny_args()
    model = TextLM(args)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 1, 97)
    params = model.init(jax.random.PRNGKey(3), prompt)

    common = dict(
        max_new_tokens=6,
        do_sample=False,
        temperature=0.0,
        top_k=None,
        pad_token_id=0,
        eos_token_id=None,
        total_len=16,
    )
    ref_tokens, ref_lengths = generate(
        model, params, prompt, None, jax.random.PRNGKey(4), **common
    )

    qmodel = QuantizedModel(model, compute_dtype=jnp.float32)
    qparams = quantize_params(params, min_size=1)
    q_tokens, q_lengths = generate(
        qmodel, qparams, prompt, None, jax.random.PRNGKey(4), **common
    )

    np.testing.assert_array_equal(
        np.asarray(ref_lengths), np.asarray(q_lengths)
    )
    # greedy decodes from int8 weights track fp32 closely at tiny scale;
    # require a strong majority of identical tokens (argmax near-ties may
    # flip under quantization noise)
    agree = np.mean(np.asarray(ref_tokens) == np.asarray(q_tokens))
    assert agree >= 0.8, f"token agreement {agree}"
