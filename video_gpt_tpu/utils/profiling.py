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


# bf16 MXU peak per chip, by device_kind prefix (public spec sheets:
# v5e 197 TFLOP/s, v4 275, v5p 459, v6e/Trillium 918). Used to self-audit
# every benchmark number against the hardware ceiling (BENCH mfu fields).
_PEAK_BF16_TFLOPS = (
    ("TPU v6", 918.0),
    ("TPU v5p", 459.0),
    ("TPU v5", 197.0),   # v5 lite / v5e
    ("TPU v4", 275.0),
)


def peak_flops(device=None) -> float | None:
    """Per-chip bf16 peak in FLOP/s for the (given or default) device;
    None when the chip generation is unknown. Override with the
    BENCH_PEAK_TFLOPS env var (a plain number, in TFLOP/s)."""
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = (device or jax.devices()[0]).device_kind
    for prefix, tf in _PEAK_BF16_TFLOPS:
        if kind.startswith(prefix):
            return tf * 1e12
    return None


def compiled_flops(jitted, *args) -> float | None:
    """XLA's flop count for the compiled program. WARNING: HLO cost
    analysis counts a ``lax.scan``/while-loop BODY ONCE, not times its
    trip count — this repo's samplers scan over denoise steps and the
    model scans over layers (flax nn.scan), so this UNDERCOUNTS by
    ~steps x layers. Use the analytic :func:`dense_model_flops` /
    :func:`attention_flops` model-flops instead for MFU; this stays for
    single-dispatch programs (e.g. AOT per-step cost sanity checks)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        return float(cost["flops"]) if cost and "flops" in cost else None
    except Exception:
        return None


def count_params(tree) -> int:
    """Number of elements across floating-point leaves (the 'P' in the
    standard 2PT/6PT model-flops accounting)."""
    import jax.numpy as jnp
    return sum(x.size for x in jax.tree.leaves(tree)
               if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                         jnp.floating))


def dense_model_flops(n_params: int, q_tokens: int) -> float:
    """Dense (matmul) model flops of one forward over ``q_tokens`` tokens:
    the standard 2*P*T estimate (Kaplan et al.; PaLM appendix B). The
    embedding gather is counted as if it were a matmul — a small
    overcount — and per-element ops are ignored."""
    return 2.0 * float(n_params) * float(q_tokens)


def attention_flops(num_layers: int, hidden: int, q_tokens: int,
                    kv_tokens: int) -> float:
    """QK^T + PV matmul flops: 2 * q * kv * hidden each, per layer (GQA
    shares K/V across query heads but every query head still multiplies
    against its group's keys, so the count is head-layout independent).
    Upper bound: block-sparse masks let the flash kernels skip never-
    visible tiles, so executed flops can be lower."""
    return 4.0 * float(num_layers) * float(hidden) * float(q_tokens) \
        * float(kv_tokens)


def mfu(flops, seconds, device=None) -> float | None:
    """flops / seconds / per-chip peak; None when either is unknown."""
    peak = peak_flops(device)
    if not flops or not seconds or not peak:
        return None
    return flops / seconds / peak
