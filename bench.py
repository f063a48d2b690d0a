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
from video_gpt_tpu.layout import (decode_rank, frame_block_inference_layout,
                                  tokens_per_frame)
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT, decode_mask
from video_gpt_tpu.sampling.scheduler import sample, sample_separate_cfg

N_CLEAN = int(os.environ.get("BENCH_CLEAN", 8))
N_GEN = int(os.environ.get("BENCH_GEN", 16))
STEPS = int(os.environ.get("BENCH_STEPS", 10))
H, W = 176, 320
REPS = int(os.environ.get("BENCH_REPS", 3))
TINY = bool(int(os.environ.get("BENCH_TINY", "0")))
# guidance interval (serving default): CFG applied only where sigma is in
# [lo, hi) — the uncond forward (~47% of a step's FLOPs) is skipped on the
# other steps (scheduler.cfg_step_flags; Kynkaenniemi et al. 2024). The
# trajectory drift this causes vs always-CFG is measured by
# scripts/cfg_drift.py on random weights. "none" = guidance at every step.
_ival = os.environ.get("BENCH_CFG_INTERVAL", "0.15,0.7")
CFG_INTERVAL = (None if _ival in ("none", "") else
                tuple(float(x) for x in _ival.split(",")))


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    cfg = ModelConfig.tiny(pos_embed_max_size=192) if TINY else ModelConfig()
    dtype = jnp.bfloat16
    model = VideoGPT(cfg, dtype=dtype)
    n = tokens_per_frame(H, W)
    hl, wl = H // 8, W // 8
    # reference-algorithm layout: CFG pair as one padded batch
    layout = frame_block_inference_layout(N_CLEAN, N_GEN, n, use_cfg=True)
    batch = Batch.from_layout(layout)
    # fast-path layouts: separate-CFG at natural lengths (pipeline.py)
    layout_c = frame_block_inference_layout(N_CLEAN, N_GEN, n, use_cfg=False)
    layout_u = frame_block_inference_layout(0, N_GEN, n, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(layout_c), Batch.from_layout(layout_u)
    tail = layout_c.noisy_tail_len()
    prefix = layout_c.length - tail
    assert decode_rank(layout_c, tail) is not None
    assert decode_rank(layout_u, layout_u.length) is not None

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

    sched = SchedulerConfig(num_steps=STEPS, prediction_type="x1",
                            cfg_interval=CFG_INTERVAL)

    assert decode_rank(layout, tail) is not None

    @jax.jit
    def cached_clip_separate(params, clean, z0):
        """Separate-CFG: each context at its natural length (fewest
        attention elements, but two M=3552 trunk calls run ~20% under the
        batched matmul rate — see scripts/profile_decode.py). Steps outside
        CFG_INTERVAL run the conditional context only."""
        cache = model.apply(params, batch_c, clean, prefix,
                            method=VideoGPT.prefill)
        bias_c = decode_mask(batch_c.meta.tail(tail), batch_c.meta)
        bias_u = decode_mask(batch_u.meta, batch_u.meta)

        def denoise_cond(z, t):
            return model.apply(params, batch_c, z, t, cache, tail, bias_c,
                               method=VideoGPT.decode)

        def denoise_pair(z, t):
            return (denoise_cond(z, t),
                    model.apply(params, batch_u, z, t, bias=bias_u))

        return sample_separate_cfg(z0, denoise_pair, sched, cfg_scale=1.5,
                                   denoise_cond_fn=denoise_cond)

    @jax.jit
    def cached_clip_batched(params, clean, z0):
        """Hybrid: prefill ONLY the conditional row (B=1), then decode the
        CFG pair as one B=2 trunk call (both tails are real tokens; the
        uncond row's cache slot is zeros, excluded by its rank mask)."""
        cache = model.apply(params, batch_c, clean, prefix,
                            method=VideoGPT.prefill)
        cache = jax.tree.map(
            lambda x: jnp.pad(x, ((0, 0), (0, 1)) + ((0, 0),) * (x.ndim - 2)),
            cache)
        dm = decode_mask(batch.meta.tail(tail), batch.meta)

        def denoise(z, t):
            return model.apply(params, batch, z, t, cache, tail, dm,
                               method=VideoGPT.decode)

        return sample(z0, denoise, sched, use_cfg=True, cfg_scale=1.5)

    @jax.jit
    def uncached_clip(params, clean, z0):
        # reference algorithm: full-sequence forward at every step, CFG pair
        # as one padded batch, KV cache disabled (LVM/scheduler.py:174)
        def denoise(z, t):
            return model.apply(params, batch, z, t, clean)

        return sample(z0, denoise, sched, use_cfg=True, cfg_scale=1.5)

    # separate-CFG measured faster than the batched B=2 pair on v5e (4.73s
    # vs 5.26s p50): XLA overlaps the two independent programs, hiding the
    # VPU-bound attention of one under the MXU-bound matmuls of the other
    mode = os.environ.get("BENCH_CFG_MODE", "separate")
    if mode == "separate":
        cached_clip = cached_clip_separate
        z0_fast = z0[:N_GEN]
    else:
        cached_clip = cached_clip_batched
        z0_fast = jnp.concatenate([z0[:N_GEN], z0[:N_GEN]], axis=0)
    from video_gpt_tpu.utils.profiling import force_ready
    force_ready(cached_clip(params, clean, z0_fast))  # compile barrier
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        cached_clip(params, clean, z0_fast).block_until_ready()
        ts.append(time.perf_counter() - t0)
    t_cached = median(ts)

    force_ready(uncached_clip(params, clean, z0))
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
        "cfg_interval": CFG_INTERVAL,
        "baseline_note": "vs_baseline = speedup over the reference's "
                         "no-KV-cache full-recompute algorithm on the same "
                         "chip (reference publishes no numbers); serving "
                         "path guides only where sigma is in cfg_interval "
                         "(drift vs always-CFG: scripts/cfg_drift.py)",
    }))


if __name__ == "__main__":
    main()
