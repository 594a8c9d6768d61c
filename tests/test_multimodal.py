"""Fused text+image+video token stream (BASELINE config #5).

Proves:
  * modality-dependent RoPE angles match the standalone per-stack rotations
  * the fused paged decode is equivalent to the same model's full uncached
    forward (teacher-forced greedy self-consistency, ragged prompts included)
  * dense-cache step-by-step decode matches the paged decode
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.configs.multimodal import MultimodalStreamArgs
from vats_tpu.inference.multimodal import generate_multimodal
from vats_tpu.models.multimodal import (
    MODALITY_IMAGE,
    MODALITY_TEXT,
    MODALITY_VIDEO,
    MultimodalLM,
    multimodal_rope_angles,
    stream_layout,
)
from vats_tpu.nn.rope import (
    apply_rope_1d,
    apply_rope_2d_ntk_positions,
    apply_rope_3d_ntk_positions,
    apply_rope_interleaved,
)


def tiny_cfg(**kw):
    base = dict(
        d_model=48,
        num_heads=4,
        query_groups=2,
        d_ffn=96,
        num_layers=2,
        dropout=0.0,
        text_vocab_size=64,
        image_vocab_size=16,
        video_vocab_size=32,
        image_grid_h=2,
        image_grid_w=2,
        video_grid_t=2,
        video_grid_h=2,
        video_grid_w=2,
        max_text_len=8,
        ntk_scale_factor=0.7,
        dtype="float32",
    )
    base.update(kw)
    return MultimodalStreamArgs(**base)


def test_rope_angles_match_standalone_stacks():
    cfg = tiny_cfg()
    hd = cfg.head_dim
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 2, hd))
    pos = jnp.array([[0, 1, 2, 3, 4]], dtype=jnp.int32)

    # text == 1D
    cos, sin = multimodal_rope_angles(
        cfg, jnp.full((1, 5), MODALITY_TEXT), pos
    )
    got = apply_rope_interleaved(x, cos, sin)
    want = apply_rope_1d(x, pos, cfg.rope_theta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # image == raster 2D-NTK
    cos, sin = multimodal_rope_angles(
        cfg, jnp.full((1, 5), MODALITY_IMAGE), pos
    )
    got = apply_rope_interleaved(x, cos, sin)
    want = apply_rope_2d_ntk_positions(
        x, pos, cfg.image_grid_w, cfg.rope_theta, cfg.ntk_scale_factor
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # video == raster 3D-NTK
    cos, sin = multimodal_rope_angles(
        cfg, jnp.full((1, 5), MODALITY_VIDEO), pos
    )
    got = apply_rope_interleaved(x, cos, sin)
    want = apply_rope_3d_ntk_positions(
        x, pos, cfg.video_grid_h, cfg.video_grid_w, cfg.rope_theta,
        cfg.ntk_scale_factor,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = MultimodalLM(cfg)
    mod, loc = stream_layout(cfg, 6)
    variables = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, mod.shape[0]), jnp.int32),
        mod[None, :],
        loc[None, :],
    )
    return cfg, model, variables["params"]


def test_full_forward_shapes(model_and_params):
    cfg, model, params = model_and_params
    t = 6 + cfg.image_tokens + cfg.video_tokens
    mod, loc = stream_layout(cfg, 6)
    logits, cache = model.apply(
        {"params": params},
        jnp.zeros((2, t), jnp.int32),
        jnp.broadcast_to(mod, (2, t)),
        jnp.broadcast_to(loc, (2, t)),
    )
    assert logits.shape == (2, t, cfg.vocab_size)
    assert cache is None


def test_fused_paged_decode_matches_full_forward(model_and_params):
    """Greedy fused generation through the paged cache must be reproduced by
    a single uncached forward over the assembled stream (teacher forcing):
    the argmax of the modality-masked logits at each position equals the
    token the paged loop emitted.  Ragged prompts included."""
    cfg, model, params = model_and_params
    t_text = 6
    text_ids = jnp.array(
        [[5, 9, 2, 7, 1, 3], [11, 4, 8, 0, 0, 0]], dtype=jnp.int32
    )
    text_mask = jnp.array(
        [[1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0]], dtype=bool
    )
    lens = [6, 3]

    img, vid = generate_multimodal(
        model, {"params": params}, text_ids, text_mask,
        jax.random.PRNGKey(2), temperature=0.0, do_sample=False,
    )
    img = np.asarray(img)
    vid = np.asarray(vid)
    assert img.shape == (2, cfg.image_grid_h, cfg.image_grid_w)
    assert vid.shape == (2, cfg.video_grid_t, cfg.video_grid_h, cfg.video_grid_w)
    assert (img >= 0).all() and (img < cfg.image_vocab_size).all()
    assert (vid >= 0).all() and (vid < cfg.video_vocab_size).all()

    vt, vi = cfg.text_vocab_size, cfg.image_vocab_size
    n_img, n_vid = cfg.image_tokens, cfg.video_tokens
    vocab = np.arange(cfg.vocab_size)

    for b in range(2):
        lb = lens[b]
        prompt = np.asarray(text_ids[b, :lb])
        gen = np.concatenate([img[b].reshape(-1) + vt,
                              vid[b].reshape(-1) + vt + vi])
        stream = np.concatenate([prompt, gen])
        mod = np.concatenate([
            np.full(lb, MODALITY_TEXT),
            np.full(n_img, MODALITY_IMAGE),
            np.full(n_vid, MODALITY_VIDEO),
        ])
        loc = np.concatenate([
            np.arange(lb), np.arange(n_img), np.arange(n_vid)
        ])
        logits, _ = model.apply(
            {"params": params},
            jnp.asarray(stream)[None, :],
            jnp.asarray(mod)[None, :],
            jnp.asarray(loc)[None, :],
        )
        logits = np.asarray(logits[0])
        # teacher forcing: logits at position i-1 predict token i
        for i in range(lb, len(stream)):
            is_img = (i - lb) < n_img
            lo = vt if is_img else vt + vi
            hi = vt + vi if is_img else cfg.vocab_size
            masked = np.where((vocab >= lo) & (vocab < hi),
                              logits[i - 1], -np.inf)
            assert int(np.argmax(masked)) == int(stream[i]), (
                f"row {b} position {i}: paged decode diverges from the "
                f"full forward"
            )


@pytest.mark.slow
def test_dense_cache_decode_matches_paged(model_and_params):
    """Step-by-step dense-cache decode produces the same logits chain as the
    paged path for an un-padded prompt."""
    cfg, model, params = model_and_params
    text_ids = jnp.array([[5, 9, 2, 7]], dtype=jnp.int32)
    t_text = 4

    img, vid = generate_multimodal(
        model, {"params": params}, text_ids, None,
        jax.random.PRNGKey(3), temperature=0.0, do_sample=False,
    )
    gen_paged = np.concatenate([
        np.asarray(img).reshape(-1) + cfg.text_vocab_size,
        np.asarray(vid).reshape(-1) + cfg.text_vocab_size
        + cfg.image_vocab_size,
    ])

    # dense-cache greedy decode
    n_total = cfg.image_tokens + cfg.video_tokens
    cache = model.init_cache(1, t_text + n_total)
    mod = jnp.zeros((1, t_text), jnp.int32)
    loc = jnp.arange(t_text, dtype=jnp.int32)[None, :]
    logits, cache = model.apply(
        {"params": params}, text_ids, mod, loc, cache=cache
    )
    nxt = logits[:, -1]
    out = []
    vt, vi = cfg.text_vocab_size, cfg.image_vocab_size
    vocab = jnp.arange(cfg.vocab_size)
    for i in range(n_total):
        is_img = i < cfg.image_tokens
        lo = vt if is_img else vt + vi
        hi = vt + vi if is_img else cfg.vocab_size
        tok = jnp.argmax(jnp.where((vocab >= lo) & (vocab < hi), nxt, -jnp.inf),
                         axis=-1).astype(jnp.int32)
        out.append(int(tok[0]))
        m = MODALITY_IMAGE if is_img else MODALITY_VIDEO
        lp = i if is_img else i - cfg.image_tokens
        logits, cache = model.apply(
            {"params": params}, tok[:, None],
            jnp.full((1, 1), m, jnp.int32), jnp.full((1, 1), lp, jnp.int32),
            cache=cache,
        )
        nxt = logits[:, 0]
    np.testing.assert_array_equal(np.asarray(out), gen_paged)
