"""File+stdout logger and step timing (LVM/utils.py:12-23 equivalent)."""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional


def create_logger(logging_dir: Optional[str] = None,
                  name: str = "video_gpt_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("[\033[34m%(asctime)s\033[0m] %(message)s",
                            datefmt="%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if logging_dir is not None:
        os.makedirs(logging_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(logging_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class PhaseTimer:
    """Accumulating wall-clock timers for pipeline phases (the reference has
    only steps/sec in the train loop; SURVEY.md §5 'tracing: none')."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def phase(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                dt = time.perf_counter() - self.t0
                timer.totals[name] = timer.totals.get(name, 0.0) + dt
                timer.counts[name] = timer.counts.get(name, 0) + 1
                return False

        return _Ctx()

    def summary(self) -> str:
        lines = []
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{k}: {self.totals[k]:.3f}s "
                         f"({self.counts[k]}x, "
                         f"{self.totals[k] / self.counts[k] * 1e3:.1f} ms avg)")
        return "\n".join(lines)
