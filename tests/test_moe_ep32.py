"""Expert parallelism at the reference-large expert count (E=32 top-2).

The reference's large tier declares 32 experts, top-2
(/root/reference/configs/transformers/nlp/model_args/model_args_large.py) but
runs them as a same-device python loop; here the sort-based ragged dispatch
runs E=32 sharded expert=4 over the fake 8-device mesh and must match the
dense (every-expert-on-every-token) oracle exactly at lossless capacity.

Also pins the LOWERING: the expert dispatch must ride all-to-all over the
expert axis — the failure mode worth a regression test is XLA silently
falling back to all-gathering the [E, C, d] expert buffers (VERDICT r2 §6).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from vats_tpu.nn.moe import MoELayer
from vats_tpu.parallel import create_mesh
from vats_tpu.parallel.mesh import DEFAULT_LOGICAL_AXIS_RULES
from vats_tpu.parallel.sharded import tree_shardings

D, F, E, K = 64, 128, 32, 2
B, T = 8, 16


def _layer(dispatch):
    return MoELayer(
        d_model=D, d_ffn=F, num_experts=E, top_k=K, dispatch=dispatch,
        capacity_factor=-1.0, double_norm=True,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


def _mesh():
    return create_mesh(
        data=2, fsdp=1, expert=4, tensor=1, seq=1, devices=jax.devices()[:8]
    )


def test_e32_sort_sharded_matches_dense_forward_and_grad():
    mesh = _mesh()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    m_sort, m_dense = _layer("sort"), _layer("dense")
    variables = m_sort.init(jax.random.PRNGKey(1), x)

    def loss_sort(v, xx):
        with nn.logical_axis_rules(DEFAULT_LOGICAL_AXIS_RULES):
            out, _ = m_sort.apply(v, xx, deterministic=True)
        return jnp.sum(out ** 2)

    def loss_dense(v, xx):
        out, _ = m_dense.apply(v, xx, deterministic=True)
        return jnp.sum(out ** 2)

    with mesh:
        shardings = tree_shardings(
            jax.eval_shape(lambda: m_sort.init(jax.random.PRNGKey(1), x)), mesh
        )
        jf = jax.jit(
            jax.value_and_grad(loss_sort),
            in_shardings=(shardings, NamedSharding(mesh, P("data"))),
        )
        v_sh = jax.device_put(variables, shardings)
        x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
        loss_s, grad_s = jf(v_sh, x_sh)

    loss_d, grad_d = jax.jit(jax.value_and_grad(loss_dense))(variables, x)
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=2e-6)
    flat_s = jax.tree_util.tree_leaves(jax.device_get(grad_s))
    flat_d = jax.tree_util.tree_leaves(jax.device_get(grad_d))
    for gs, gd in zip(flat_s, flat_d):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gd), rtol=5e-5, atol=5e-6
        )


def test_e32_dispatch_lowers_to_all_to_all():
    """The compiled expert-sharded forward must contain all-to-all, and its
    only top-level all-gathers must be token-level (router-sized), never the
    [E, C, d] expert buffers."""
    mesh = _mesh()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    m_sort = _layer("sort")
    variables = m_sort.init(jax.random.PRNGKey(1), x)

    def loss(v, xx):
        with nn.logical_axis_rules(DEFAULT_LOGICAL_AXIS_RULES):
            out, _ = m_sort.apply(v, xx, deterministic=True)
        return jnp.sum(out ** 2)

    with mesh:
        shardings = tree_shardings(
            jax.eval_shape(lambda: m_sort.init(jax.random.PRNGKey(1), x)), mesh
        )
        txt = (
            jax.jit(
                loss,
                in_shardings=(shardings, NamedSharding(mesh, P("data"))),
            )
            .lower(variables, x)
            .compile()
            .as_text()
        )
    assert "all-to-all" in txt, "expert dispatch did not lower to all-to-all"
    # expert buffers are [E/4=8, C, d] per shard; an all-gather of one would
    # move >= 8*C*D floats. Token-level gathers ([N*k, E] routing metadata or
    # [N, d] activations) are orders smaller at these shapes.
    buf_elems = 8 * (B * T) * D  # one expert-shard buffer, capacity == N
    for line in txt.splitlines():
        m = re.search(r"= f32\[([0-9,]+)\][^ ]* all-gather", line)
        if m:
            elems = int(np.prod([int(s) for s in m.group(1).split(",")]))
            assert elems < buf_elems, (
                f"expert-buffer-sized all-gather in HLO: {line.strip()[:120]}"
            )
