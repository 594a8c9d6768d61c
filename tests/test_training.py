"""Synthetic-training integration tests: real loop + optimizer converge.

Mirrors the reference's synthetic-training strategy
(/root/reference/tests/transformers/nlp/synthetic_training_tests.py:15-90):
random-token data through the *real* train/validate loops."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from vats_tpu.checkpoint import load_checkpoint, save_checkpoint
from vats_tpu.configs import ModelArgs, TrainingArgs
from vats_tpu.data import synthetic_lm_batches
from vats_tpu.models import TextLM
from vats_tpu.train import (
    compute_loss,
    compute_perplexity,
    cosine_with_warmup_schedule,
    create_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
    train,
    validate,
)


def tiny_args(**kw):
    base = dict(
        d_model=64,
        num_heads=4,
        query_groups=2,
        d_ffn=128,
        num_layers=2,
        dropout=0.0,
        vocab_size=64,
        max_seq_len=32,
        left_window=-1,
        num_experts=1,
        top_k=1,
        dtype="float32",
        gradient_checkpointing=False,
        max_batch_size=8,
    )
    base.update(kw)
    return ModelArgs(**base)


def make_setup(model_args=None, **targs):
    args = model_args or tiny_args()
    t = TrainingArgs(grad_accum_steps=1, max_train_tokens=10**9, **targs)
    model = TextLM(args)
    tx = create_optimizer(t, num_training_steps=200)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((2, 16), jnp.int32)
    )
    return args, t, model, state


def test_cosine_schedule_matches_reference_formula():
    import math

    sched = cosine_with_warmup_schedule(1.0, 10, 110, num_cycles=0.5)
    np.testing.assert_allclose(float(sched(5)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(0)), 0.0, rtol=1e-6)
    prog = (60 - 10) / 100
    expected = 0.5 * (1 + math.cos(math.pi * 2 * 0.5 * prog))
    np.testing.assert_allclose(float(sched(60)), expected, rtol=1e-5)


def test_compute_loss_ignores_minus_100():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[1, 2, -100, -100]])
    total, lm, aux = compute_loss(logits, labels)
    np.testing.assert_allclose(float(lm), np.log(8), rtol=1e-5)
    assert compute_perplexity(lm) > 0


def test_synthetic_training_reduces_loss():
    args, t, model, state = make_setup()
    data = synthetic_lm_batches(
        jax.random.PRNGKey(1),
        vocab_size=args.vocab_size,
        batch_size=8,
        seq_len=16,
        num_batches=60,
    )
    # fixed tiny dataset repeated so the model can memorize
    batches = list(data)[:4] * 15
    step_fn = make_train_step(model, t)
    state, summary = train(
        model, state, iter(batches), t, rng=jax.random.PRNGKey(2),
        train_step_fn=step_fn, log_every=1000,
    )
    assert summary["steps"] == 60
    assert summary["tokens_seen"] > 0

    # loss at the end must be well below the uniform baseline
    first_losses = []
    st2 = create_train_state(
        model, create_optimizer(t, 200), jax.random.PRNGKey(0),
        jnp.zeros((2, 16), jnp.int32),
    )
    m0 = make_eval_step(model, t)(st2.params, batches[0])
    final = make_eval_step(model, t)(state.params, batches[0])
    assert float(final["lm_loss"]) < float(m0["lm_loss"]) * 0.8


def test_validate_loop():
    args, t, model, state = make_setup()
    data = synthetic_lm_batches(
        jax.random.PRNGKey(3),
        vocab_size=args.vocab_size,
        batch_size=4,
        seq_len=16,
        num_batches=3,
        pad_fraction=0.3,
    )
    metrics = validate(model, state, data, t)
    assert metrics["batches"] == 3
    assert np.isfinite(metrics["val_loss"])
    assert metrics["val_perplexity"] > 0


def test_grad_accum_matches_large_batch():
    """MultiSteps(k=2) over two half-batches == one full-batch step."""
    args = tiny_args(dropout=0.0)
    model = TextLM(args)
    t1 = TrainingArgs(grad_accum_steps=1, weight_decay=0.0)
    t2 = TrainingArgs(grad_accum_steps=2, weight_decay=0.0)
    data = list(
        synthetic_lm_batches(
            jax.random.PRNGKey(4), vocab_size=args.vocab_size,
            batch_size=8, seq_len=16, num_batches=1,
        )
    )[0]
    half1 = {k: v[:4] for k, v in data.items()}
    half2 = {k: v[4:] for k, v in data.items()}

    s_full = create_train_state(
        model, create_optimizer(t1, 100), jax.random.PRNGKey(0),
        jnp.zeros((2, 16), jnp.int32),
    )
    s_acc = create_train_state(
        model, create_optimizer(t2, 100), jax.random.PRNGKey(0),
        jnp.zeros((2, 16), jnp.int32),
    )
    step_full = make_train_step(model, t1)
    step_acc = make_train_step(model, t2)
    rng = jax.random.PRNGKey(5)
    s_full, _ = step_full(s_full, data, rng)
    s_acc, _ = step_acc(s_acc, half1, rng)
    s_acc, _ = step_acc(s_acc, half2, rng)
    # params should be close (average of grads vs grad of average: equal
    # when both halves have the same token count)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(s_acc.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_checkpoint_roundtrip():
    args, t, model, state = make_setup()
    batch = next(
        synthetic_lm_batches(
            jax.random.PRNGKey(6), vocab_size=args.vocab_size,
            batch_size=2, seq_len=16, num_batches=1,
        )
    )
    step_fn = make_train_step(model, t)
    state, _ = step_fn(state, batch, jax.random.PRNGKey(7))

    with tempfile.TemporaryDirectory() as d:
        path = save_checkpoint(
            d, state, model_args=args, training_args=t, loss=1.23, is_best=True
        )
        assert os.path.basename(path) == "best_model"
        restored, meta = load_checkpoint(path, target=jax.device_get(state))
        assert meta["loss"] == 1.23
        assert meta["model_args"]["d_model"] == args.d_model
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored state continues training
        restored = restored.replace(apply_fn=model.apply)
        _, m = step_fn(restored, batch, jax.random.PRNGKey(8))
        assert np.isfinite(float(m["loss"]))


def test_non_finite_grads_are_skipped():
    args, t, model, state = make_setup()
    batch = next(
        synthetic_lm_batches(
            jax.random.PRNGKey(9), vocab_size=args.vocab_size,
            batch_size=2, seq_len=16, num_batches=1,
        )
    )
    step_fn = make_train_step(model, t)
    good_params_before = jax.device_get(state.params)
    # poison params to produce NaN loss -> grads NaN -> update must be skipped
    poisoned = jax.tree_util.tree_map(
        lambda x: x.at[(0,) * x.ndim].set(jnp.nan) if x.size else x, state.params
    )
    state_p = state.replace(params=poisoned)
    # snapshot before the step: the train step donates its input state
    poisoned_snapshot = jax.device_get(poisoned)
    state_p2, m = step_fn(state_p, batch, jax.random.PRNGKey(10))
    # apply_if_finite: params unchanged where they were finite
    leaves_before = jax.tree_util.tree_leaves(poisoned_snapshot)
    leaves_after = jax.tree_util.tree_leaves(state_p2.params)
    for a, b in zip(leaves_before, leaves_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_roundtrip():
    from vats_tpu.checkpoint import CheckpointManager, load_checkpoint

    args, t, model, state = make_setup()
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, model_args=args, training_args=t,
                                async_save=True)
        saved = mgr.maybe_save(state, val_loss=1.0, force_regular=False)
        assert saved["best"] is not None
        mgr.wait()
        restored, meta = load_checkpoint(saved["best"],
                                         target=jax.device_get(state))
        assert meta["loss"] == 1.0
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_policy_dots_matches_full():
    """remat_policy='dots' must change memory, not math: grads identical."""
    from vats_tpu.train import make_train_step

    batch = next(iter(synthetic_lm_batches(
        jax.random.PRNGKey(3), vocab_size=64, batch_size=2, seq_len=16,
        num_batches=1,
    )))
    metrics = {}
    for policy in ("full", "dots"):
        args = tiny_args(gradient_checkpointing=True, remat_policy=policy)
        _, t, model, state = make_setup(model_args=args)
        step_fn = make_train_step(model, t)
        _, m = step_fn(state, batch, jax.random.PRNGKey(4))
        metrics[policy] = float(m["loss"])
    np.testing.assert_allclose(metrics["full"], metrics["dots"], rtol=1e-6)


def test_adam_mu_dtype_bf16_state_and_training():
    """adam_mu_dtype='bfloat16' halves m's dtype and still trains."""
    args = tiny_args()
    t = TrainingArgs(grad_accum_steps=1, adam_mu_dtype="bfloat16")
    model = TextLM(args)
    tx = create_optimizer(t, num_training_steps=200)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((2, 16), jnp.int32)
    )
    # locate the ScaleByAdamState inside the wrapped (apply_if_finite ->
    # chain) optimizer state and check mu's dtype
    mus = [
        leaf.mu for leaf in jax.tree_util.tree_leaves(
            state.opt_state, is_leaf=lambda x: hasattr(x, "mu")
        ) if hasattr(leaf, "mu")
    ]
    assert mus, "no ScaleByAdamState found in opt_state"
    for mu in mus:
        for leaf in jax.tree_util.tree_leaves(mu):
            assert leaf.dtype == jnp.bfloat16
    step_fn = make_train_step(model, t)
    batch = next(iter(synthetic_lm_batches(
        jax.random.PRNGKey(5), vocab_size=64, batch_size=2, seq_len=16,
        num_batches=1,
    )))
    state2, m = step_fn(state, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(m["loss"]))
