"""Orbax checkpointing with auto-resume.

Replaces accelerator.save_state / load_state + the checkpoint-* glob
auto-resume logic (train_x1_stage1:304-334, 437-455). Also exports params in
the reference's safetensors layout via utils/torch_export for
cross-framework parity checks.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


def _manager(directory: str, keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                             create=True),
    )


def save_checkpoint(directory: str, step: int, state: Any,
                    keep: int = 5) -> None:
    """One-shot blocking save (tests / ad-hoc use; trainers use the async
    :class:`CheckpointWriter`)."""
    with _manager(directory, keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


class CheckpointWriter:
    """Persistent manager with ASYNC saves.

    ``save()`` copies the state to host, then serialises on orbax's
    background thread while the train loop keeps stepping (the reference
    blocks its loop in ``accelerator.save_state`` every ``ckpt_every``,
    train_x1_stage1:437-455). The host copy completes before ``save``
    returns, so the caller may freely donate/overwrite the device buffers.
    At most one save is in flight; ``close()`` (or the context manager)
    drains before exit."""

    def __init__(self, directory: str, keep: int = 5):
        self._mgr = _manager(directory, keep)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self) -> "CheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if re.fullmatch(r"\d+", name):
            steps.append(int(name))
    return max(steps) if steps else None


def restore_checkpoint(directory: str, state_like: Any,
                       step: Optional[int] = None) -> Tuple[Any, int]:
    """Restore (latest by default) into the structure of ``state_like``."""
    with _manager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        state = mgr.restore(step, args=ocp.args.StandardRestore(state_like))
    return state, step


def restore_subtree(directory: str, item: Any,
                    step: Optional[int] = None) -> Tuple[Any, int]:
    """PARTIAL restore: only the subtrees named in ``item`` (a mapping of
    top-level TrainState fields to abstract trees) are read from disk —
    inference restores skip the AdamW state entirely (~3x the params bytes
    at 3.8B scale)."""
    with _manager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        out = mgr.restore(step, args=ocp.args.PyTreeRestore(
            item=item, partial_restore=True))
    return out, step
