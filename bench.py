"""Flagship benchmark: 16-frame next-clip prediction on one TPU chip.

Scenario (BASELINE.md): condition on 8 frames at 176x320, generate a
16-frame clip, 10 denoise steps, CFG pair — the model denoise loop at
reference scale (Phi-3-mini class, bf16) with Pallas flash attention and the
clean-prefix KV cache.

vs_baseline: speedup over the *reference's algorithm on the same chip* —
full-sequence recompute at every denoise step with the KV cache disabled
(LVM/scheduler.py:174, inference driver:96), run through this framework's own
kernels. The reference publishes no numbers (BASELINE.json "published": {}),
so same-hardware algorithmic speedup is the honest comparable; the
reference's torch path would only be slower than this baseline.

Prints ONE JSON line.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from video_gpt_tpu.config import ModelConfig, SchedulerConfig
from video_gpt_tpu.layout import frame_block_inference_layout, tokens_per_frame
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.sampling.scheduler import sample

N_CLEAN = int(os.environ.get("BENCH_CLEAN", 8))
N_GEN = int(os.environ.get("BENCH_GEN", 16))
STEPS = int(os.environ.get("BENCH_STEPS", 10))
H, W = 176, 320
REPS = int(os.environ.get("BENCH_REPS", 3))
TINY = bool(int(os.environ.get("BENCH_TINY", "0")))


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    cfg = ModelConfig.tiny(pos_embed_max_size=192) if TINY else ModelConfig()
    dtype = jnp.bfloat16
    model = VideoGPT(cfg, dtype=dtype)
    n = tokens_per_frame(H, W)
    hl, wl = H // 8, W // 8
    layout = frame_block_inference_layout(N_CLEAN, N_GEN, n, use_cfg=True)
    batch = Batch.from_layout(layout)
    tail = layout.noisy_tail_len()
    prefix = layout.length - tail

    nn_ = 2 * N_GEN
    z0 = jax.random.normal(jax.random.PRNGKey(0),
                           (nn_, hl, wl, cfg.in_channels), dtype)
    clean = jax.random.normal(jax.random.PRNGKey(1),
                              (N_CLEAN, hl, wl, cfg.in_channels), dtype)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(2), batch, z0, jnp.zeros((nn_,), dtype), clean))
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, dtype if jnp.issubdtype(
            s.dtype, jnp.floating) else s.dtype), shapes)

    sched = SchedulerConfig(num_steps=STEPS, prediction_type="x1")

    @jax.jit
    def cached_clip(params, clean, z0):
        cache = model.apply(params, batch, clean, prefix,
                            method=VideoGPT.prefill)

        def denoise(z, t):
            return model.apply(params, batch, z, t, cache, tail,
                               method=VideoGPT.decode)

        return sample(z0, denoise, sched, use_cfg=True, cfg_scale=1.5)

    @jax.jit
    def uncached_clip(params, clean, z0):
        # reference algorithm: full-sequence forward at every step
        def denoise(z, t):
            return model.apply(params, batch, z, t, clean)

        return sample(z0, denoise, sched, use_cfg=True, cfg_scale=1.5)

    cached_clip(params, clean, z0).block_until_ready()  # compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        cached_clip(params, clean, z0).block_until_ready()
        ts.append(time.perf_counter() - t0)
    t_cached = median(ts)

    uncached_clip(params, clean, z0).block_until_ready()
    ts = []
    for _ in range(max(REPS - 1, 1)):
        t0 = time.perf_counter()
        uncached_clip(params, clean, z0).block_until_ready()
        ts.append(time.perf_counter() - t0)
    t_uncached = median(ts)

    print(json.dumps({
        "metric": "generated frames/sec/chip (16-frame clip prediction, "
                  f"{N_CLEAN}-frame condition, {STEPS} steps, 176x320, CFG)",
        "value": round(N_GEN / t_cached, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(t_uncached / t_cached, 3),
        "p50_latency_s": round(t_cached, 4),
        "baseline_note": "vs_baseline = speedup over the reference's "
                         "no-KV-cache full-recompute algorithm on the same "
                         "chip (reference publishes no numbers)",
    }))


if __name__ == "__main__":
    main()
