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


def force_ready(out):
    """Hard execution barrier for benchmarking warmups.

    On the axon TPU tunnel, ``block_until_ready`` returns immediately while
    an executable is still being remote-compiled — a timing loop that
    "warms up" with it can read ~0s and queue every stage concurrently
    (enough to OOM HBM). A device->host transfer of one element is the
    only reliable barrier for the FIRST call of a new jit signature;
    ``block_until_ready`` is trustworthy afterwards."""
    import numpy as np
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])
    return out
