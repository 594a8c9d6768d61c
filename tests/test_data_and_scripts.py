"""Tests for the data layer (filters, datasets, loaders) and script smoke runs."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from vats_tpu.data.text_cleaning import DeduplicationFilter, TextQualityFilter
from vats_tpu.data.text_dataset import TextDataset, train_val_split
from vats_tpu.data.vision_data import array_batches, normalize_images, setup_video_loaders
from vats_tpu.train.metrics import IGNORE_INDEX

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GOOD_TEXT = (
    "The history of computing spans several centuries of human ingenuity. "
    "Early mechanical calculators gave way to electronic machines during the "
    "twentieth century. Researchers developed programming languages to make "
    "these machines useful for science and commerce. Today, computers power "
    "nearly every aspect of modern life, from communication to medicine."
)


class CharTokenizer:
    pad_token_id = 0
    eos_token_id = None

    def encode(self, text):
        return [ord(c) % 90 + 1 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(i + 31) for i in ids)


def test_quality_filter_accepts_good_text():
    f = TextQualityFilter()
    out = f.filter_text(GOOD_TEXT)
    assert out is not None and len(out) > 100


def test_quality_filter_rejects_bad_text():
    f = TextQualityFilter()
    assert f.filter_text("short") is None
    assert f.filter_text("日本語のテキスト" * 50) is None  # non-English
    assert f.filter_text("a " * 200) is None  # degenerate words


def test_quality_filter_cleaning():
    f = TextQualityFilter()
    cleaned = f.clean_text(
        "Visit https://example.com or mail me@site.org or call 555-123-4567!!!!!"
    )
    assert "https" not in cleaned
    assert "@" not in cleaned
    assert "555" not in cleaned
    assert "!!!!" not in cleaned


def test_quality_filter_batch_call():
    f = TextQualityFilter()
    out = f({"text": [GOOD_TEXT, "short"]})
    assert out["text"][0] is not None
    assert out["text"][1] is None


def test_dedup_exact_and_near():
    d = DeduplicationFilter(similarity_threshold=0.8)
    assert not d.is_duplicate(GOOD_TEXT)
    assert d.is_duplicate(GOOD_TEXT)  # second time exact dup
    assert d.is_duplicate("  " + GOOD_TEXT.upper() + " ")  # normalized dup

    d2 = DeduplicationFilter(similarity_threshold=0.5)
    assert not d2.is_near_duplicate(GOOD_TEXT)
    # small edit -> near duplicate via shingles
    assert d2.is_near_duplicate(GOOD_TEXT.replace("modern life", "daily life"))
    assert not d2.is_near_duplicate("completely different content about cats")


def test_dedup_batch_call():
    d = DeduplicationFilter()
    out = d({"text": [GOOD_TEXT, GOOD_TEXT, None]})
    assert out["text"][0] is not None
    assert out["text"][1] is None
    assert out["text"][2] is None


def test_text_dataset_labels_shifted():
    ds = TextDataset.from_texts(["hello world example"], CharTokenizer(), 32)
    row = ds[0]
    ids, labels = row["input_ids"], row["labels"]
    n = int(row["padding_mask"].sum())
    np.testing.assert_array_equal(labels[: n - 1], ids[1:n])
    assert labels[n - 1] == IGNORE_INDEX
    assert (labels[n:] == IGNORE_INDEX).all()


def test_text_dataset_batching_and_split():
    texts = [f"sample text number {i} with content" for i in range(20)]
    ds = TextDataset.from_texts(texts, CharTokenizer(), 48)
    train, val = train_val_split(ds, val_fraction=0.2)
    assert len(train) == 16 and len(val) == 4
    batches = list(train.batches(4, epochs=1))
    assert len(batches) == 4
    assert batches[0]["input_ids"].shape == (4, 48)


def test_array_batches_and_normalize():
    images = np.random.rand(10, 3, 8, 8).astype(np.float32) * 255
    labels = np.arange(10)
    out = list(array_batches(images, labels, 4, epochs=1))
    assert len(out) == 2  # drop_last
    assert out[0]["images"].shape == (4, 3, 8, 8)
    norm = normalize_images(images)
    assert abs(norm.mean()) < 3


def test_video_loader():
    with tempfile.TemporaryDirectory() as d:
        for i in range(4):
            np.save(os.path.join(d, f"clip{i}_{i % 2}.npy"),
                    np.random.rand(3, 4, 8, 8).astype(np.float32))
        batches = list(setup_video_loaders(d, 2, epochs=1))
        assert len(batches) == 2
        assert batches[0]["videos"].shape == (2, 3, 4, 8, 8)
        assert set(np.concatenate([b["labels"] for b in batches])) == {0, 1}


@pytest.mark.parametrize(
    "script,extra",
    [
        ("scripts/nlp/train.py",
         ["--size", "xsmall", "--max-train-tokens", "512", "--batch-size", "2",
          "--seq-len", "32", "--eval-every-steps", "4"]),
        ("scripts/image_gen/train.py", ["--steps", "3", "--log-every", "1"]),
        ("scripts/video_gen/train.py", ["--steps", "3"]),
        ("scripts/vision/vit2d/train.py",
         ["--epochs", "1", "--steps-per-epoch", "2", "--batch-size", "2"]),
        ("scripts/vision/vit3d/train.py",
         ["--epochs", "1", "--steps-per-epoch", "2", "--batch-size", "2"]),
    ],
)
@pytest.mark.slow
def test_script_smoke(script, extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["VATS_FORCE_CPU"] = "1"
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *extra],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env=env,
    )
    assert result.returncode == 0, result.stderr[-3000:]
