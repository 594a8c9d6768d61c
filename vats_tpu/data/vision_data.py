"""Vision data loaders.

Reference: ImageNet ImageFolder loaders with torchvision train transforms
(/root/reference/data/transformers/vision/vit_2d/setup_data.py:9-92) and a
``pass``-stub video loader (/root/reference/data/transformers/vision/vit_3d/
setup_data.py:10-25 — designed here).

TPU-first split: hosts only decode/collate raw pixel arrays; resize /
normalize / patchify / augmentation all run inside the jitted device graph
(models' patch embeds + data/augmentations.py).  torchvision is optional —
when present, ``setup_data_loaders`` wraps ImageFolder; otherwise loaders
built from arrays/directories of .npy clips keep everything runnable.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

logger = logging.getLogger("vats_tpu.data")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_images(images: np.ndarray) -> np.ndarray:
    """[B, C, H, W] uint8/float in [0,255] or [0,1] -> ImageNet-normalized."""
    x = images.astype(np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    return (x - IMAGENET_MEAN[None, :, None, None]) / IMAGENET_STD[
        None, :, None, None
    ]


def array_batches(
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    normalize: bool = True,
    epochs: Optional[int] = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """In-memory image loader yielding {'images', 'labels'} numpy batches."""
    rng = np.random.RandomState(seed)
    epoch = 0
    n = len(images)
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            batch_images = images[idx]
            if normalize:
                batch_images = normalize_images(batch_images)
            yield {"images": batch_images, "labels": labels[idx]}
        epoch += 1


def setup_data_loaders(
    train_dir: str = "/data/imagenet1k/train",
    val_dir: str = "/data/imagenet1k/val",
    batch_size: int = 256,
    *,
    image_size: int = 256,
    num_workers: int = 8,
) -> Tuple[Iterator, Iterator]:
    """ImageFolder-backed loaders (reference setup_data.py:52-70).

    Heavy geometric/photometric train augmentation stays on the host via
    torchvision when available; mixup/cutmix run on device.  Raises a clear
    error when torchvision or the data directories are missing.
    """
    try:
        import torch
        from torch.utils.data import DataLoader
        from torchvision import datasets, transforms
    except Exception as exc:  # pragma: no cover - optional dependency
        raise RuntimeError(
            "torchvision is required for ImageFolder loading"
        ) from exc
    for d in (train_dir, val_dir):
        if not os.path.isdir(d):
            raise FileNotFoundError(f"dataset directory not found: {d}")

    train_tf = transforms.Compose(
        [
            transforms.RandomResizedCrop(image_size),
            transforms.RandomHorizontalFlip(),
            transforms.ColorJitter(0.4, 0.4, 0.4),
            transforms.ToTensor(),
        ]
    )
    val_tf = transforms.Compose(
        [transforms.Resize(image_size), transforms.CenterCrop(image_size),
         transforms.ToTensor()]
    )

    def wrap(loader):
        for images, labels in loader:
            yield {
                "images": normalize_images(images.numpy()),
                "labels": labels.numpy().astype(np.int32),
            }

    train_loader = DataLoader(
        datasets.ImageFolder(train_dir, train_tf),
        batch_size=batch_size,
        shuffle=True,
        num_workers=num_workers,
        drop_last=True,
    )
    val_loader = DataLoader(
        datasets.ImageFolder(val_dir, val_tf),
        batch_size=batch_size,
        shuffle=False,
        num_workers=num_workers,
    )
    return wrap(train_loader), wrap(val_loader)


def setup_video_loaders(
    clips_dir: str,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    epochs: Optional[int] = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Video clip loader (the reference's is a ``pass`` stub).

    Expects a directory of ``<name>_<label>.npy`` clips shaped
    [C, T, H, W]; clips in a batch must share shapes (bucket upstream).
    """
    files = sorted(f for f in os.listdir(clips_dir) if f.endswith(".npy"))
    if not files:
        raise FileNotFoundError(f"no .npy clips in {clips_dir}")
    rng = np.random.RandomState(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(files)) if shuffle else np.arange(len(files))
        for start in range(0, len(order), batch_size):
            idx = order[start : start + batch_size]
            if len(idx) < batch_size:
                break
            clips, labels = [], []
            for i in idx:
                name = files[int(i)]
                clips.append(np.load(os.path.join(clips_dir, name)))
                stem = os.path.splitext(name)[0]
                labels.append(int(stem.rsplit("_", 1)[-1]))
            yield {
                "videos": np.stack(clips).astype(np.float32),
                "labels": np.asarray(labels, dtype=np.int32),
            }
        epoch += 1
