"""Multi-host runtime init and failure handling.

Replaces the reference's launch-side machinery — torchrun env plumbing,
deepspeed.init_distributed, HCCL timeout knobs, and the `pkill -f python`
before every launch (LVM/acceleration/parallel_states.py:66-81,
pretrain_stage1_*.sh) — with jax.distributed plus structured failure
handling:

- ``init_runtime()``: one call per process; on multi-host slices it wires
  the coordinator from env (JAX_COORDINATOR_ADDRESS or COORDINATOR_ADDRESS /
  NUM_PROCESSES / PROCESS_ID), no-ops single-host.
- ``GracefulShutdown``: SIGTERM/SIGINT watcher so the trainer checkpoints
  before preemption instead of dying mid-step (v5e pods are preemptible;
  the reference has no elastic story, SURVEY.md §5).
"""
from __future__ import annotations

import os
import signal
import threading
from typing import Optional

import jax


def init_runtime(coordinator: Optional[str] = None,
                 num_processes: Optional[int] = None,
                 process_id: Optional[int] = None) -> None:
    coordinator = coordinator or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None:
        return  # single-host
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", 1))
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", 0))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main_process() -> bool:
    return jax.process_index() == 0


class GracefulShutdown:
    """Flips ``requested`` on SIGTERM/SIGINT; the train loop checks it each
    step and checkpoints before exiting."""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.requested = threading.Event()
        self._prev = {}
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):
                pass  # non-main thread or unsupported platform

    def _handler(self, signum, frame):
        self.requested.set()

    def restore(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
