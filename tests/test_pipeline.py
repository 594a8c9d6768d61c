"""Pipeline parallelism: staged execution equals sequential layer application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.parallel import create_mesh
from vats_tpu.parallel.pipeline import pipeline_apply


def mlp_block(params, h):
    """One stage = its slice of stacked layers, applied sequentially."""
    w_stack, b_stack = params

    def body(h, wb):
        w, b = wb
        return jnp.tanh(h @ w + b), None

    h, _ = jax.lax.scan(body, h, (w_stack, b_stack))
    return h


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 8), (4, 2)])
def test_pipeline_matches_sequential(stages, microbatches):
    # 8 layers total, d=16
    num_layers, d, batch = 8, 16, 16
    rng = np.random.RandomState(0)
    ws = jnp.asarray(rng.randn(num_layers, d, d) * 0.3, jnp.float32)
    bs = jnp.asarray(rng.randn(num_layers, d) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(batch, d), jnp.float32)

    # sequential oracle
    ref = x
    for i in range(num_layers):
        ref = jnp.tanh(ref @ ws[i] + bs[i])

    # pipeline over the 'seq' axis used as stage axis
    mesh = create_mesh(data=1, fsdp=1, expert=1, tensor=1, seq=stages,
                       devices=jax.devices()[:stages])
    out = pipeline_apply(
        mlp_block, (ws, bs), x, mesh=mesh, axis_name="seq",
        num_microbatches=microbatches,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_pipeline_rejects_bad_microbatching():
    mesh = create_mesh(data=1, fsdp=1, expert=1, tensor=1, seq=2,
                       devices=jax.devices()[:2])
    ws = jnp.zeros((2, 4, 4))
    bs = jnp.zeros((2, 4))
    x = jnp.zeros((5, 4))
    with pytest.raises(ValueError):
        pipeline_apply(mlp_block, (ws, bs), x, mesh=mesh, axis_name="seq",
                       num_microbatches=3)
