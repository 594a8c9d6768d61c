"""scan_layers: logits match the python-loop model via param conversion."""

import jax
import jax.numpy as jnp
import numpy as np

from vats_tpu.configs import ModelArgs
from vats_tpu.models import TextLM


def cfgs(**kw):
    base = dict(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=3,
        dropout=0.0, vocab_size=97, max_seq_len=32, left_window=-1,
        dtype="float32", gradient_checkpointing=False,
    )
    base.update(kw)
    return ModelArgs(scan_layers=False, **base), ModelArgs(scan_layers=True, **base)


def unbox(tree):
    from flax.core import meta

    return jax.tree_util.tree_map(
        lambda x: x.unbox() if isinstance(x, meta.AxisMetadata) else x,
        tree, is_leaf=lambda x: isinstance(x, meta.AxisMetadata),
    )


def test_scan_matches_loop():
    cfg_loop, cfg_scan = cfgs()
    m_loop, m_scan = TextLM(cfg_loop), TextLM(cfg_scan)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, 97)
    loop_params = unbox(m_loop.init(jax.random.PRNGKey(1), ids))["params"]
    scan_params = dict(loop_params)
    scan_params = TextLM.stack_layer_params(scan_params, cfg_loop.num_layers)

    out_loop, _, _ = m_loop.apply({"params": loop_params}, ids)
    out_scan, _, _ = m_scan.apply({"params": scan_params}, ids)
    np.testing.assert_allclose(
        np.asarray(out_loop), np.asarray(out_scan), rtol=2e-4, atol=2e-5
    )

    # roundtrip conversion
    back = TextLM.unstack_scan_params(scan_params, cfg_loop.num_layers)
    for a, b in zip(
        jax.tree_util.tree_leaves(loop_params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_trains():
    _, cfg_scan = cfgs(gradient_checkpointing=True)
    model = TextLM(cfg_scan)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, 97)
    params = model.init(jax.random.PRNGKey(3), ids)

    def loss(p):
        logits, _, _ = model.apply(
            p, ids, deterministic=False, rngs={"dropout": jax.random.PRNGKey(4)}
        )
        return jnp.mean(logits**2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
