"""Background batch prefetcher.

Replaces torch DataLoader worker processes (train drivers: num_workers=4,
timeout knobs, train_x1_stage1:244-272): worker threads decode/collate the
next batches while the device executes the current step; cv2 decode releases
the GIL so threads overlap with host dispatch.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class Prefetcher:
    def __init__(self, make_batch: Callable[[int], object], depth: int = 2,
                 workers: int = 1, start: int = 0):
        """``make_batch(step_index)`` must be thread-safe. ``start`` sets the
        first index (auto-resumed runs continue the data order instead of
        replaying from 0)."""
        self._make = make_batch
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._next = start
        self._consume = start       # next index the consumer must see
        self._pending: dict = {}    # out-of-order arrivals (workers > 1)
        self._lock = threading.Lock()
        self._threads = [threading.Thread(target=self._run, daemon=True)
                         for _ in range(workers)]
        for t in self._threads:
            t.start()

    def _run(self):
        while not self._stop.is_set():
            with self._lock:
                idx = self._next
                self._next += 1
            try:
                batch = self._make(idx)
            except Exception as e:  # surface on the consumer side
                batch = e
            while not self._stop.is_set():
                try:
                    self._q.put((idx, batch), timeout=0.2)
                    break
                except queue.Full:
                    continue

    def get(self):
        """Returns batches strictly in index order: with several worker
        threads racing, later indices can land on the queue first; they are
        parked in ``_pending`` (at most ~``workers`` entries) until their
        turn, so multi-worker runs keep the deterministic data order that
        checkpoint resume relies on."""
        while self._consume not in self._pending:
            idx, batch = self._q.get()
            self._pending[idx] = batch
        batch = self._pending.pop(self._consume)
        self._consume += 1
        if isinstance(batch, Exception):
            raise batch
        return batch

    def close(self):
        self._stop.set()
        while not self._q.empty():
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        # join workers: a daemon thread still inside native code (cv2) when
        # the interpreter finalises aborts the process
        for t in self._threads:
            t.join(timeout=10.0)
