"""Native token-shard loader tests: C fast path vs numpy, packing semantics."""

import os
import tempfile

import numpy as np
import pytest

from vats_tpu.data.shard_dataset import ShardDataset, TokenShard, _load_native
from vats_tpu.train.metrics import IGNORE_INDEX


def make_shard():
    docs = [
        [5, 6, 7, 8],
        [9, 10],
        list(range(20, 45)),  # longer than seq_len
        [11, 12, 13],
        [14],
    ]
    return TokenShard.from_documents(docs), docs


def test_native_library_compiles():
    assert _load_native() is not None, "C toolchain should be available here"


def test_pack_batch_semantics():
    shard, docs = make_shard()
    ds = ShardDataset(shard, seq_len=8, pad_id=0)
    batch = ds.pack_batch(np.array([0, 1, 2]))
    ids, labels, mask = batch["input_ids"], batch["labels"], batch["padding_mask"]
    np.testing.assert_array_equal(ids[0, :4], [5, 6, 7, 8])
    assert (ids[0, 4:] == 0).all()
    np.testing.assert_array_equal(labels[0, :3], [6, 7, 8])
    assert (labels[0, 3:] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 0, 0, 0, 0])
    # truncated long doc
    np.testing.assert_array_equal(ids[2], list(range(20, 28)))
    assert labels[2, 7] == IGNORE_INDEX
    np.testing.assert_array_equal(labels[2, :7], list(range(21, 28)))


def test_native_matches_numpy_fallback():
    shard, _ = make_shard()
    ds = ShardDataset(shard, seq_len=8, pad_id=0)
    idx = np.array([0, 1, 2, 3, 4])
    fast = ds.pack_batch(idx)
    ids = np.empty((5, 8), np.int32)
    labels = np.empty((5, 8), np.int32)
    mask = np.empty((5, 8), np.uint8)
    ds._pack_batch_numpy(idx.astype(np.int64), ids, labels, mask)
    np.testing.assert_array_equal(fast["input_ids"], ids)
    np.testing.assert_array_equal(fast["labels"], labels)
    np.testing.assert_array_equal(fast["padding_mask"], mask.astype(bool))


def test_pack_sequences_segments():
    shard, docs = make_shard()
    ds = ShardDataset(shard, seq_len=8, pad_id=0)
    batch, consumed = ds.pack_sequences(0, batch_size=2)
    ids, labels, segs = batch["input_ids"], batch["labels"], batch["segment_ids"]
    # row 0 packs docs 0 (len 4) + 1 (len 2): [5,6,7,8,9,10,pad,pad]
    np.testing.assert_array_equal(ids[0, :6], [5, 6, 7, 8, 9, 10])
    np.testing.assert_array_equal(segs[0, :6], [1, 1, 1, 1, 2, 2])
    assert (segs[0, 6:] == 0).all()
    # no cross-document label: position 3 (last of doc 0) has no label
    assert labels[0, 3] == IGNORE_INDEX
    np.testing.assert_array_equal(labels[0, :3], [6, 7, 8])
    assert labels[0, 4] == 10
    assert labels[0, 5] == IGNORE_INDEX
    # row 1 gets the oversized doc truncated
    np.testing.assert_array_equal(ids[1], list(range(20, 28)))
    assert consumed == 3


def test_shard_save_load_roundtrip():
    shard, _ = make_shard()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "shard.npz")
        shard.save(path)
        loaded = TokenShard.load(path)
        np.testing.assert_array_equal(loaded.tokens, shard.tokens)
        np.testing.assert_array_equal(loaded.offsets, shard.offsets)
        ds = ShardDataset(loaded, seq_len=8)
        batches = list(ds.batches(2, epochs=1, shuffle=False))
        assert len(batches) == 2


def test_native_throughput_sane():
    """The C path assembles a large batch without error (smoke perf)."""
    rng = np.random.RandomState(0)
    docs = [list(rng.randint(1, 1000, rng.randint(5, 200))) for _ in range(2000)]
    shard = TokenShard.from_documents(docs)
    ds = ShardDataset(shard, seq_len=128)
    import time

    t0 = time.perf_counter()
    for _ in range(20):
        batch = ds.pack_batch(rng.randint(0, 2000, 256))
    dt = time.perf_counter() - t0
    assert batch["input_ids"].shape == (256, 128)
    assert dt < 5.0


def test_packed_segments_isolate_documents_in_model():
    """Segment-masked attention: a packed row's doc-1 logits are unaffected
    by doc-2 content (end-to-end through TextLM)."""
    import jax
    import jax.numpy as jnp

    from vats_tpu.configs import ModelArgs
    from vats_tpu.models import TextLM

    cfg = ModelArgs(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        dropout=0.0, vocab_size=64, max_seq_len=16, left_window=-1,
        dtype="float32", gradient_checkpointing=False,
    )
    model = TextLM(cfg)
    ids = jnp.asarray([[1, 2, 3, 4, 10, 11, 12, 0]], jnp.int32)
    segs = jnp.asarray([[1, 1, 1, 1, 2, 2, 2, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 0]], bool)
    params = model.init(jax.random.PRNGKey(0), ids)
    out1, _, _ = model.apply(params, ids, padding_mask=mask, segment_ids=segs)
    ids2 = ids.at[0, 4:7].set(jnp.asarray([20, 21, 22]))
    out2, _, _ = model.apply(params, ids2, padding_mask=mask, segment_ids=segs)
    np.testing.assert_allclose(
        np.asarray(out1[0, :4]), np.asarray(out2[0, :4]), rtol=2e-3, atol=2e-4
    )
