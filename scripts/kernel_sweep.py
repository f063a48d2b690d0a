"""Decode-kernel block-size sweep at the long-rollout shapes.

The rollout profile (scripts/profile_generate.py) shows the two denoise
scans at ~21s of the 23.7s warm rollout; per-step attention at block-1
shapes (Lq 7248, Lk 16912) is ~48 TF. This sweeps the streaming-split and
resident decode kernels' block sizes at those shapes and prints achieved
TFLOP/s so tile choices are measured, not guessed.

Run on the real chip. Env: REPS (5).
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from video_gpt_tpu.ops.flash_attention import (DecodeMask, flash_mha_decode,
                                               flash_mha_decode_split,
                                               flash_mha_decode_streaming,
                                               flash_mha_decode_streaming_split)
from video_gpt_tpu.utils.profiling import force_ready

REPS = int(os.environ.get("REPS", 5))
B, H, D, DP = 1, 32, 96, 128


def timed_tf(label, fn, flops, *args):
    """x8 layer-equivalents under ONE jit so per-dispatch overhead (large
    through the axon tunnel, and not constant eagerly) cannot masquerade
    as kernel time; reports per-invocation ms."""
    @jax.jit
    def x8(*a):
        def body(acc, _):
            return acc + fn(*a).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.zeros(a[0].shape, jnp.float32),
                              jnp.arange(8))
        return out

    try:
        out = x8(*args)
        force_ready(out)
    except Exception as e:
        print(f"{label:<46s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(x8(*args))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2] / 8
    print(f"{label:<46s} {dt * 1e3:8.2f} ms   {flops / dt / 1e12:6.1f} TF/s",
          flush=True)


def mk(lq, lk):
    kq = jax.random.PRNGKey(0)
    q = jax.random.normal(kq, (B, lq, H, D), jnp.bfloat16)
    k = jax.random.normal(kq, (B, H, lk, DP), jnp.bfloat16)
    v = jax.random.normal(kq, (B, H, lk, DP), jnp.bfloat16)
    # rank: cache keys visible to all (-1); q_off all >= 2 (plain tail)
    rank = jnp.full((B, lk), -1, jnp.int32)
    qoff = jnp.full((B, lq), 2, jnp.int32)
    return q, k, v, DecodeMask(rank, qoff)


def main():
    # ---- block-1 rollout: lc 9664 cache + lt 7248 tail, lq 7248 ----------
    lq, lc, lt = 7248, 9664, 7248
    q, k, v, mask = mk(lq, lc + lt)
    kc, vc = k[:, :, :lc], v[:, :, :lc]
    kt_, vt_ = k[:, :, lc:], v[:, :, lc:]
    flops = 4 * B * H * lq * (lc + lt) * D

    # block_q now equalizes internally (_stream_block_q): 2048 -> 4x1824
    # (7296 rows) instead of 4x2048 (8192 rows, +13% MXU waste)
    for bq, bk in [(2048, 512), (2048, 1024), (1024, 512), (512, 512)]:
        timed_tf(f"stream_split b1 bq={bq}(eq) bk={bk}",
                 functools.partial(flash_mha_decode_streaming_split,
                                   block_q=bq, block_k=bk, mask=mask),
                 flops, q, kc, vc, kt_, vt_)

    # ---- uncond self-attention: lq = lk = 7248 ---------------------------
    # resident is forced to bq=96 here (<128 MXU rows = >=25% array waste);
    # the streaming kernel's tall equalized tiles should beat it
    q2, k2, v2, mask2 = mk(7248, 7248)
    flops2 = 4 * B * H * 7248 * 7248 * D
    timed_tf("resident uncond bq=96 (current)",
             functools.partial(flash_mha_decode, mask=mask2,
                               kv_heads_major=True),
             flops2, q2, k2, v2)
    for bq, bk in [(2048, 512), (2048, 1024), (1024, 512), (512, 512)]:
        timed_tf(f"stream uncond bq={bq}(eq) bk={bk}",
                 functools.partial(flash_mha_decode_streaming, mask=mask2,
                                   block_q=bq, block_k=bk,
                                   kv_heads_major=True),
                 flops2, q2, k2, v2)

    # ---- flagship decode: lq 3552 tail vs lc 1776 + lt 3552 --------------
    lq3, lc3, lt3 = 3552, 1776, 3552
    q3, k3, v3, mask3 = mk(lq3, lc3 + lt3)
    kc3, vc3 = k3[:, :, :lc3], v3[:, :, :lc3]
    kt3, vt3 = k3[:, :, lc3:], v3[:, :, lc3:]
    flops3 = 4 * B * H * lq3 * (lc3 + lt3) * D
    timed_tf("resident_split flagship bq=auto(96) (current)",
             functools.partial(flash_mha_decode_split, mask=mask3),
             flops3, q3, kc3, vc3, kt3, vt3)
    for bq, bk in [(2048, 512), (1776, 512), (2048, 1024), (1024, 512),
                   (512, 512)]:
        timed_tf(f"stream_split flagship bq={bq}(eq) bk={bk}",
                 functools.partial(flash_mha_decode_streaming_split,
                                   block_q=bq, block_k=bk, mask=mask3),
                 flops3, q3, kc3, vc3, kt3, vt3)

    # ---- flagship uncond: lq = lk = 3552 ----------------------------------
    q4, k4, v4, mask4 = mk(3552, 3552)
    flops4 = 4 * B * H * 3552 * 3552 * D
    timed_tf("resident uncond flagship bq=auto(256) (cur)",
             functools.partial(flash_mha_decode, mask=mask4,
                               kv_heads_major=True),
             flops4, q4, k4, v4)
    for bq, bk in [(2048, 512), (1024, 512)]:
        timed_tf(f"stream uncond flagship bq={bq}(eq) bk={bk}",
                 functools.partial(flash_mha_decode_streaming, mask=mask4,
                                   block_q=bq, block_k=bk,
                                   kv_heads_major=True),
                 flops4, q4, k4, v4)


if __name__ == "__main__":
    main()
