"""Checkpointing — Orbax-backed replacement for the reference's Keras
``ModelCheckpoint`` (weights-only H5, every 3 epochs, best by val_loss,
reference: code/train.py:74-91) and explicit stage-end saves
(code/train.py:182-186, 212-216).

Two layers:
  * ``save_params`` / ``load_params``: one-shot weight files (the
    ``*_trained_weights_{stage_1,final}`` equivalents) — a msgpack-free
    Orbax StandardCheckpointer directory.
  * ``CheckpointManager``: periodic training checkpoints with
    best-val-loss retention and resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_params(path: str, tree: Any) -> None:
    """Save a pytree (e.g. {'params': ..., 'batch_stats': ...}) to a
    checkpoint directory (absolute path; overwrites)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree saved by :func:`save_params`. ``like`` provides
    dtype/shape/sharding structure (required for sharded restore)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


class CheckpointManager:
    """Periodic + best-metric checkpoint retention.

    Saves every ``every`` epochs, keeps ``max_to_keep``, tracks best by
    ``val_loss`` (min), like the reference ModelCheckpoint(period=3,
    save_best_only=True, monitor='val_loss')."""

    def __init__(self, directory: str, every: int = 3, max_to_keep: int = 5):
        self.every = every
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m["val_loss"],
                best_mode="min",
                create=True,
            ),
        )

    def maybe_save(self, epoch: int, tree: Any, val_loss: float) -> bool:
        if self.every and (epoch + 1) % self.every != 0:
            return False
        self._mngr.save(
            epoch, args=ocp.args.StandardSave(tree), metrics={"val_loss": float(val_loss)}
        )
        return True

    def best_epoch(self) -> Optional[int]:
        return self._mngr.best_step()

    def latest_epoch(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, epoch: int, like: Any) -> Any:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return self._mngr.restore(epoch, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()
