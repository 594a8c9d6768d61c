"""Multi-device sharding tests on the fake 8-device CPU mesh."""

import sys
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_sharded_loss_matches_single_device():
    """The sharded train step computes the same loss as the unsharded one."""
    from vats_tpu.configs import ModelArgs, TrainingArgs
    from vats_tpu.data import synthetic_lm_batches
    from vats_tpu.models import TextLM
    from vats_tpu.parallel import create_mesh
    from vats_tpu.parallel.sharded import make_sharded_train
    from vats_tpu.train import create_optimizer, create_train_state
    from vats_tpu.train.loop import make_train_step_fn

    cfg = ModelArgs(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        dropout=0.0, vocab_size=128, max_seq_len=64, left_window=-1,
        num_experts=4, top_k=2, moe_dispatch="scatter", dtype="float32",
        gradient_checkpointing=False, use_mqa=False,
    )
    model = TextLM(cfg)
    targs = TrainingArgs(grad_accum_steps=1)
    batch = next(
        synthetic_lm_batches(
            jax.random.PRNGKey(0), vocab_size=cfg.vocab_size,
            batch_size=8, seq_len=32, num_batches=1,
        )
    )

    mesh = create_mesh(data=2, fsdp=2, expert=2, tensor=1, seq=1)
    init_fn, step_fn, _ = make_sharded_train(
        model, targs, mesh, batch, num_training_steps=10
    )
    state_sharded = init_fn(jax.random.PRNGKey(1))

    tx = create_optimizer(targs, 10)
    state_single = create_train_state(
        model, tx, jax.random.PRNGKey(1), batch["input_ids"]
    )

    # identical init (same rng) => identical first-step loss
    _, m_sharded = step_fn(state_sharded, batch, jax.random.PRNGKey(2))
    raw_step = make_train_step_fn(model, targs)
    _, m_single = jax.jit(raw_step)(state_single, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_single["loss"]), rtol=1e-4
    )


def test_sharded_checkpoint_resume(tmp_path):
    """Save a sharded TrainState, restore it, continue training on the mesh."""
    import numpy as np

    from vats_tpu.checkpoint import load_checkpoint, save_checkpoint
    from vats_tpu.configs import ModelArgs, TrainingArgs
    from vats_tpu.data import synthetic_lm_batches
    from vats_tpu.models import TextLM
    from vats_tpu.parallel import create_mesh
    from vats_tpu.parallel.sharded import make_sharded_train

    cfg = ModelArgs(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        dropout=0.0, vocab_size=128, max_seq_len=64, left_window=-1,
        num_experts=4, top_k=2, moe_dispatch="scatter", dtype="float32",
        gradient_checkpointing=False, use_mqa=False,
    )
    model = TextLM(cfg)
    targs = TrainingArgs(grad_accum_steps=1)
    batch = next(
        synthetic_lm_batches(
            jax.random.PRNGKey(0), vocab_size=cfg.vocab_size,
            batch_size=8, seq_len=32, num_batches=1,
        )
    )
    mesh = create_mesh(data=2, fsdp=2, expert=2, tensor=1, seq=1)
    init_fn, step_fn, _ = make_sharded_train(model, targs, mesh, batch,
                                             num_training_steps=10)
    state = init_fn(jax.random.PRNGKey(1))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(2))
    snapshot = jax.device_get(state.params)

    path = save_checkpoint(str(tmp_path), state, model_args=cfg,
                           training_args=targs, loss=2.0, is_best=True)
    restored, meta = load_checkpoint(path, target=jax.device_get(state))
    for a, b in zip(
        jax.tree_util.tree_leaves(snapshot),
        jax.tree_util.tree_leaves(jax.device_get(restored.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state steps again under the same mesh/shardings (the jitted
    # step's in_shardings re-lay the host arrays onto the mesh)
    restored = restored.replace(apply_fn=model.apply)
    _, metrics = step_fn(restored, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
