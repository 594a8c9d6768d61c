"""Model-level flash-kernel dispatch: TextLM with impl='flash_interpret'
matches the XLA path, and the profiler utilities work."""

import jax
import jax.numpy as jnp
import numpy as np

from vats_tpu.configs import ModelArgs
from vats_tpu.models import TextLM
from vats_tpu.utils.profiling import StepTimer, annotate


def test_textlm_flash_matches_xla():
    common = dict(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        dropout=0.0, vocab_size=97, max_seq_len=64, left_window=16,
        dtype="float32", gradient_checkpointing=False,
    )
    m_xla = TextLM(ModelArgs(attention_impl="xla", **common))
    m_flash = TextLM(ModelArgs(attention_impl="flash_interpret", **common))
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 48), 1, 97)
    mask = jnp.ones((2, 48), bool).at[1, 30:].set(False)
    params = m_xla.init(jax.random.PRNGKey(1), ids)
    out_xla, _, _ = m_xla.apply(params, ids, padding_mask=mask)
    out_flash, _, _ = m_flash.apply(params, ids, padding_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_xla[0]), np.asarray(out_flash[0]), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_xla[1, :30]), np.asarray(out_flash[1, :30]),
        rtol=2e-3, atol=2e-4,
    )


def test_step_timer_and_annotation():
    timer = StepTimer(window=4)
    timer.start()
    with annotate("unit-test-phase"):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    dt = timer.tick(x, tokens=64)
    assert dt >= 0
    s = timer.summary()
    assert s["tokens_per_s"] > 0
