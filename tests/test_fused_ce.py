"""Fused (chunked) readout+cross-entropy: parity with full-logits CE.

The fused path (TrainingArgs.fused_ce_chunk) applies the vocab readout per
sequence chunk under jax.checkpoint so the fp32 [B, T, V] logits buffer
never exists — loss AND gradients must match the classic path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.configs import TrainingArgs, nlp_xsmall
from vats_tpu.models import TextLM
from vats_tpu.train.loop import make_train_step_fn
from vats_tpu.train.metrics import (
    IGNORE_INDEX,
    compute_loss,
    fused_linear_cross_entropy,
)


def _cfg(**kw):
    base = dict(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        vocab_size=160, dropout=0.0, num_experts=2, top_k=1,
        max_seq_len=64, use_mqa=False, gradient_checkpointing=False,
        dtype="float32", param_dtype="float32", moe_dispatch="dense",
    )
    base.update(kw)
    return nlp_xsmall(**base)


@pytest.mark.parametrize("chunk", [8, 16, 48])
def test_fused_ce_matches_full_logits(chunk):
    """Pure-function parity: hidden @ E^T softmax-CE, ignore masking,
    non-divisible chunking (T=40 with chunk=16/48 exercises the pad)."""
    b, t, d, v = 3, 40, 16, 96
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    hidden = jax.random.normal(k1, (b, t, d))
    readout = jax.random.normal(k2, (v, d)) * 0.1
    labels = jax.random.randint(k3, (b, t), 0, v)
    labels = labels.at[:, -5:].set(IGNORE_INDEX).at[0, 0].set(IGNORE_INDEX)

    def full(h, w):
        logits = jnp.einsum("btd,vd->btv", h, w)
        total, lm, _ = compute_loss(logits, labels)
        return lm

    def fused(h, w):
        return fused_linear_cross_entropy(
            h, w, labels, chunk=chunk, compute_dtype=jnp.float32
        )

    l_full, g_full = jax.value_and_grad(full, argnums=(0, 1))(hidden, readout)
    l_fused, g_fused = jax.value_and_grad(fused, argnums=(0, 1))(
        hidden, readout
    )
    np.testing.assert_allclose(float(l_fused), float(l_full), rtol=1e-6)
    for gf, gc in zip(g_fused, g_full):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gc), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("tie", [True, False])
def test_fused_train_step_matches_classic(tie):
    """End-to-end: one training step with fused_ce_chunk produces the same
    loss and the same updated parameters as the classic full-logits step."""
    cfg = _cfg(tie_weights=tie)
    model = TextLM(cfg)
    b, t = 4, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, t), 1, cfg.vocab_size)
    labels = jax.random.randint(
        jax.random.PRNGKey(2), (b, t), 0, cfg.vocab_size
    ).at[:, -4:].set(IGNORE_INDEX)
    batch = {
        "input_ids": ids, "labels": labels,
        "padding_mask": jnp.ones((b, t), bool),
    }

    from vats_tpu.train import create_optimizer, create_train_state

    def one_step(targs):
        tx = create_optimizer(targs, 100)
        state = create_train_state(
            model, tx, jax.random.PRNGKey(3), jnp.zeros((b, t), jnp.int32)
        )
        # jit: the eager op-by-op step dominated the fast lane (36 s)
        step = jax.jit(make_train_step_fn(model, targs))
        return step(state, batch, jax.random.PRNGKey(4))

    s_classic, m_classic = one_step(TrainingArgs(grad_accum_steps=1))
    s_fused, m_fused = one_step(
        TrainingArgs(grad_accum_steps=1, fused_ce_chunk=16)
    )
    np.testing.assert_allclose(
        float(m_fused["lm_loss"]), float(m_classic["lm_loss"]),
        rtol=2e-5,
    )
    for (ka, a), (kb, c) in zip(
        jax.tree_util.tree_leaves_with_path(s_fused.params),
        jax.tree_util.tree_leaves_with_path(s_classic.params),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-6,
            err_msg=f"param diverged: {jax.tree_util.keystr(ka)}",
        )
