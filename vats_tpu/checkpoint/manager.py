"""Orbax checkpointing with the reference's save/restore schema.

Reference (/root/reference/utils/transformers/nlp/checkpointing.py:24-130):
a dict of {model state, optimizer state, scheduler state, tokens_seen/epoch,
loss, model_args, training_args}, saved as ``best_model`` or
``checkpoint_tokens_seen_N``; the loader restores args first, then states.

TPU-native: orbax PyTreeCheckpointer saves the whole TrainState pytree
(params + optax state + counters) atomically and async-capable; config
dataclasses are stored as JSON-able dicts alongside.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from vats_tpu.train.state import TrainState


def _args_to_dict(args) -> Optional[Dict]:
    if args is None:
        return None
    if dataclasses.is_dataclass(args):
        return dataclasses.asdict(args)
    return dict(args)


def save_checkpoint(
    directory: str,
    state: TrainState,
    *,
    model_args=None,
    training_args=None,
    loss: Optional[float] = None,
    is_best: bool = False,
    step_key: Optional[int] = None,
    checkpointer: Optional[ocp.AbstractCheckpointer] = None,
) -> str:
    """Save train state + args.  Returns the checkpoint path.

    Naming mirrors the reference: ``best_model`` vs
    ``checkpoint_tokens_seen_{N}`` (checkpointing.py:44-52).  Pass an
    ``ocp.AsyncCheckpointer`` as ``checkpointer`` for non-blocking saves
    (the training step keeps running while the write happens in the
    background — call ``checkpointer.wait_until_finished()`` before exit).
    """
    if step_key is None:
        step_key = int(state.tokens_seen)
    name = "best_model" if is_best else f"checkpoint_tokens_seen_{step_key}"
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = checkpointer or ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    meta = {
        "model_args": _args_to_dict(model_args),
        "training_args": _args_to_dict(training_args),
        "tokens_seen": int(state.tokens_seen),
        "loss": loss,
        "is_best": is_best,
    }
    # sibling file, not inside the directory: async saves finalize the
    # checkpoint dir with an atomic rename that would clobber extra files
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path


def load_checkpoint(
    path: str,
    target: Optional[TrainState] = None,
) -> Tuple[Any, Dict]:
    """Restore (state, meta).  ``target`` provides the pytree structure;
    without it the raw restored tree is returned (args-only inspection —
    the reference's ``load_only_args`` mode)."""
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    restored = ckptr.restore(path, item=target)
    meta: Dict = {}
    for meta_path in (path + ".meta.json", os.path.join(path, "vats_meta.json")):
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            break
    return restored, meta


def unbox_restored(tree):
    """Strip flax ``LogicallyPartitioned`` boxes that a target-less orbax
    restore returns as plain ``{"value": ..., "names": ...}`` dicts (the
    live boxes only reconstruct when restoring into a matching target
    TrainState).  Safe on already-plain trees."""
    if isinstance(tree, dict):
        keys = set(tree.keys())
        if "value" in keys and keys <= {"value", "names", "mesh", "rules"}:
            return unbox_restored(tree["value"])
        return {k: unbox_restored(v) for k, v in tree.items()}
    if hasattr(tree, "unbox"):
        return tree.unbox()
    return tree


class CheckpointManager:
    """Best/regular checkpoint policy driver (reference script behavior:
    periodic regular saves + best-on-val-improvement,
    /root/reference/scripts/transformers/nlp/train.py:229-259)."""

    def __init__(
        self,
        directory: str,
        *,
        model_args=None,
        training_args=None,
        async_save: bool = False,
    ):
        self.directory = directory
        self.model_args = model_args
        self.training_args = training_args
        self.best_loss = float("inf")
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if async_save
            else None
        )
        os.makedirs(directory, exist_ok=True)

    def wait(self) -> None:
        """Block until any in-flight async save completes."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def maybe_save(
        self, state: TrainState, val_loss: float, *, force_regular: bool = False
    ) -> Dict[str, Optional[str]]:
        saved = {"best": None, "regular": None}
        if val_loss < self.best_loss:
            self.best_loss = val_loss
            saved["best"] = save_checkpoint(
                self.directory,
                state,
                model_args=self.model_args,
                training_args=self.training_args,
                loss=val_loss,
                is_best=True,
                checkpointer=self._ckptr,
            )
        if force_regular:
            saved["regular"] = save_checkpoint(
                self.directory,
                state,
                model_args=self.model_args,
                training_args=self.training_args,
                loss=val_loss,
                checkpointer=self._ckptr,
            )
        return saved
