"""Profiler hooks: jax.profiler traces for xprof/tensorboard.

The reference has no tracing at all (SURVEY.md §5); here a context manager
wraps any pipeline/training region and writes a TPU trace viewable in
TensorBoard's profile plugin.
"""
from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/video_gpt_tpu_trace",
          annotate: str = "video_gpt_tpu"):
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        with jax.profiler.TraceAnnotation(annotate):
            yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Lightweight region annotation usable inside jitted host loops."""
    return jax.profiler.TraceAnnotation(name)
