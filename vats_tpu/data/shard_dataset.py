"""Token-shard dataset with native (C) batch assembly.

Host-side input pipeline for TPU training at scale: tokenized documents are
stored as one contiguous int32 arena + int64 offsets (a "shard", written /
memory-mapped with numpy).  The hot loops — per-row gather/pad/shift-labels
and greedy multi-document sequence packing with segment ids — run in the C
library ``vats_tpu/data/native/shard_loader.c`` (compiled on first use with
the system toolchain, ctypes-bound; a numpy fallback keeps everything working
when no compiler is available).

The reference materializes python lists of padded token tensors
(/root/reference/data/transformers/nlp/data_streaming.py:35-70); this is the
TPU-native redesign: zero-copy mmap shards, O(1) memory over corpus size,
GIL-free batch assembly, and sequence packing the reference lacks entirely
(segment ids feed the attention kernels' segment masks).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from vats_tpu.train.metrics import IGNORE_INDEX

logger = logging.getLogger("vats_tpu.data")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "shard_loader.c")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvats_shard.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                        check=True,
                        capture_output=True,
                        timeout=120,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.pack_batch.argtypes = [
            i32p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, i32p, i32p, u8p,
        ]
        lib.pack_batch.restype = None
        lib.pack_sequences.argtypes = [
            i32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, u8p,
        ]
        lib.pack_sequences.restype = ctypes.c_int64
        _lib = lib
        logger.info("native shard loader loaded from %s", _LIB_PATH)
    except Exception as exc:  # pragma: no cover - toolchain missing
        logger.warning("native shard loader unavailable (%s); numpy fallback", exc)
        _lib = None
    return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class TokenShard:
    """Contiguous token arena + offsets; mmap-able on disk."""

    def __init__(self, tokens: np.ndarray, offsets: np.ndarray):
        self.tokens = np.ascontiguousarray(tokens, dtype=np.int32)
        self.offsets = np.ascontiguousarray(offsets, dtype=np.int64)

    @classmethod
    def from_documents(cls, docs: List[List[int]]) -> "TokenShard":
        offsets = np.zeros(len(docs) + 1, dtype=np.int64)
        for i, d in enumerate(docs):
            offsets[i + 1] = offsets[i] + len(d)
        tokens = np.empty(int(offsets[-1]), dtype=np.int32)
        for i, d in enumerate(docs):
            tokens[offsets[i] : offsets[i + 1]] = d
        return cls(tokens, offsets)

    @property
    def num_docs(self) -> int:
        return len(self.offsets) - 1

    def save(self, path: str) -> None:
        np.savez(path, tokens=self.tokens, offsets=self.offsets)

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "TokenShard":
        data = np.load(path, mmap_mode="r" if mmap else None)
        return cls(np.asarray(data["tokens"]), np.asarray(data["offsets"]))


class ShardDataset:
    """Batched LM samples from a TokenShard; C fast path, numpy fallback."""

    def __init__(self, shard: TokenShard, seq_len: int, pad_id: int = 0):
        self.shard = shard
        self.seq_len = seq_len
        self.pad_id = pad_id

    def pack_batch(self, doc_indices: np.ndarray) -> Dict[str, np.ndarray]:
        """One padded row per document index."""
        b, s = len(doc_indices), self.seq_len
        ids = np.empty((b, s), dtype=np.int32)
        labels = np.empty((b, s), dtype=np.int32)
        mask = np.empty((b, s), dtype=np.uint8)
        lib = _load_native()
        idx = np.ascontiguousarray(doc_indices, dtype=np.int64)
        if lib is not None:
            lib.pack_batch(
                _ptr(self.shard.tokens, ctypes.c_int32),
                _ptr(self.shard.offsets, ctypes.c_int64),
                _ptr(idx, ctypes.c_int64),
                b, s, self.pad_id, IGNORE_INDEX,
                _ptr(ids, ctypes.c_int32),
                _ptr(labels, ctypes.c_int32),
                _ptr(mask, ctypes.c_uint8),
            )
        else:
            self._pack_batch_numpy(idx, ids, labels, mask)
        return {
            "input_ids": ids,
            "labels": labels,
            "padding_mask": mask.astype(bool),
        }

    def _pack_batch_numpy(self, idx, ids, labels, mask):
        off, toks, s = self.shard.offsets, self.shard.tokens, self.seq_len
        for r, d in enumerate(idx):
            ln = min(int(off[d + 1] - off[d]), s)
            ids[r, :ln] = toks[off[d] : off[d] + ln]
            ids[r, ln:] = self.pad_id
            mask[r, :ln] = 1
            mask[r, ln:] = 0
            labels[r, : max(ln - 1, 0)] = ids[r, 1:ln]
            labels[r, max(ln - 1, 0) :] = IGNORE_INDEX

    def pack_sequences(
        self, start_doc: int, batch_size: int
    ) -> Tuple[Dict[str, np.ndarray], int]:
        """Greedy multi-document packing with segment ids.

        Returns (batch, docs_consumed).  Requires the native library."""
        lib = _load_native()
        b, s = batch_size, self.seq_len
        ids = np.empty((b, s), dtype=np.int32)
        labels = np.empty((b, s), dtype=np.int32)
        segs = np.empty((b, s), dtype=np.int32)
        mask = np.empty((b, s), dtype=np.uint8)
        if lib is None:
            raise RuntimeError("pack_sequences requires the native library")
        consumed = lib.pack_sequences(
            _ptr(self.shard.tokens, ctypes.c_int32),
            _ptr(self.shard.offsets, ctypes.c_int64),
            self.shard.num_docs, start_doc, b, s, self.pad_id, IGNORE_INDEX,
            _ptr(ids, ctypes.c_int32),
            _ptr(labels, ctypes.c_int32),
            _ptr(segs, ctypes.c_int32),
            _ptr(mask, ctypes.c_uint8),
        )
        return (
            {
                "input_ids": ids,
                "labels": labels,
                "segment_ids": segs,
                "padding_mask": mask.astype(bool),
            },
            int(consumed),
        )

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        epochs: Optional[int] = 1,
        packed: bool = False,
    ) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            if packed:
                doc = 0
                while doc < self.shard.num_docs:
                    batch, consumed = self.pack_sequences(doc, batch_size)
                    if consumed == 0:
                        break
                    doc += consumed
                    yield batch
            else:
                order = (
                    rng.permutation(self.shard.num_docs)
                    if shuffle
                    else np.arange(self.shard.num_docs)
                )
                for i in range(0, len(order) - batch_size + 1, batch_size):
                    yield self.pack_batch(order[i : i + batch_size])
            epoch += 1
