"""Flagship decode-step breakdown at the LONG-ROLLOUT block-1 shapes.

Same method as scripts/profile_decode.py but at the bench_suite long-rollout
geometry (240x320 video -> 300 tokens/frame; block 1: 32 clean frames cached
= 9664 keys, 24-frame noisy tail = 7248 queries, 16912 total keys), where
the streaming-split decode kernel runs. A/B-times the model's cond decode
step with block_q 512 vs 2048 for the streaming kernels — the standalone
kernel sweep (scripts/kernel_sweep.py) overstates kernel cost ~2x vs
in-model, so tile decisions are made on the in-model number.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from video_gpt_tpu.config import ModelConfig
from video_gpt_tpu.layout import frame_block_inference_layout, tokens_per_frame
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT, decode_mask
from video_gpt_tpu.ops import flash_attention as fa
from video_gpt_tpu.utils.profiling import force_ready

N_CLEAN, N_GEN, H, W = 32, 24, 240, 320
REPS = 5


def timed(label, fn, *args):
    out = fn(*args)
    force_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:<34s} {ts[len(ts) // 2]:.4f}s", flush=True)


def main():
    cfg = ModelConfig()
    model = VideoGPT(cfg, dtype=jnp.bfloat16)
    n = tokens_per_frame(H, W)
    assert n == 300, n
    lay_c = frame_block_inference_layout(N_CLEAN, N_GEN, n, use_cfg=False)
    lay_u = frame_block_inference_layout(0, N_GEN, n, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(lay_c), Batch.from_layout(lay_u)
    tail = lay_c.noisy_tail_len()
    prefix = lay_c.length - tail
    print(f"prefix={prefix} tail={tail} keys={lay_c.length}", flush=True)
    hl, wl = H // 8, W // 8
    z = jax.random.normal(jax.random.PRNGKey(0), (N_GEN, hl, wl, 4),
                          jnp.bfloat16)
    clean = jax.random.normal(jax.random.PRNGKey(1), (N_CLEAN, hl, wl, 4),
                              jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(2), batch_c, z, jnp.zeros((N_GEN,), jnp.bfloat16),
        clean))
    params = jax.tree.map(lambda s: jnp.zeros(
        s.shape, jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating)
        else s.dtype), shapes)
    t_vec = jnp.full((N_GEN,), 0.5, jnp.bfloat16)

    prefill = jax.jit(lambda p, c: model.apply(
        p, batch_c, c, prefix, method=VideoGPT.prefill))
    cache = prefill(params, clean)
    force_ready(cache)

    dm_c = decode_mask(batch_c.meta.tail(tail), batch_c.meta)
    dm_u = decode_mask(batch_u.meta, batch_u.meta)

    orig_split = fa.flash_mha_decode_streaming_split
    orig_stream = fa.flash_mha_decode_streaming
    for bq in (512, 1024, 2048):
        fa.flash_mha_decode_streaming_split = functools.partial(
            orig_split, block_q=bq)
        fa.flash_mha_decode_streaming = functools.partial(
            orig_stream, block_q=bq)
        cond = jax.jit(lambda p, z, t, cache: model.apply(
            p, batch_c, z, t, cache, tail, dm_c, method=VideoGPT.decode))
        timed(f"cond_step bq={bq}", cond, params, z, t_vec, cache)
    fa.flash_mha_decode_streaming_split = orig_split
    fa.flash_mha_decode_streaming = orig_stream

    uncond = jax.jit(lambda p, z, t: model.apply(
        p, batch_u, z, t, bias=dm_u))
    timed("uncond_step (resident)", uncond, params, z, t_vec)


if __name__ == "__main__":
    main()
