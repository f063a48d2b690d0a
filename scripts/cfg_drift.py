"""Quality-drift measurement for the CFG-interval serving schedule.

Compares the final denoised latents of the interval-guided trajectory
(SchedulerConfig.cfg_interval — uncond forwards skipped outside the
interval) against the always-CFG trajectory, at the flagship geometry
(8-frame condition, 16-frame clip, 10 steps, 176x320) with RANDOM
initialised weights — no released checkpoint exists to measure against,
so this bounds the *trajectory divergence the schedule itself introduces*
through a real (randomly initialised) network, not perceptual quality.

Reports, per interval: relative final-latent MSE
``mean((z_int - z_full)^2) / mean(z_full^2)`` and the per-step guidance
flags. One JSON line per interval.

Env: NUM_LAYERS (default 8; full depth is unnecessary for trajectory
dynamics), BENCH_STEPS, CFG_INTERVALS="0.15,0.7;0.0,0.75;none".
"""
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from video_gpt_tpu.config import ModelConfig, SchedulerConfig
from video_gpt_tpu.layout import (decode_rank, frame_block_inference_layout,
                                  tokens_per_frame)
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT, decode_mask
from video_gpt_tpu.sampling.scheduler import cfg_step_flags, sample_separate_cfg

N_CLEAN, N_GEN, H, W = 8, 16, 176, 320
STEPS = int(os.environ.get("BENCH_STEPS", 10))
NUM_LAYERS = int(os.environ.get("NUM_LAYERS", 8))
INTERVALS = os.environ.get("CFG_INTERVALS", "0.15,0.7;0.0,0.75;0.2,0.6")


def main():
    cfg = ModelConfig(num_layers=NUM_LAYERS)
    dtype = jnp.bfloat16
    model = VideoGPT(cfg, dtype=dtype)
    n = tokens_per_frame(H, W)
    hl, wl = H // 8, W // 8
    layout_c = frame_block_inference_layout(N_CLEAN, N_GEN, n, use_cfg=False)
    layout_u = frame_block_inference_layout(0, N_GEN, n, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(layout_c), Batch.from_layout(layout_u)
    tail = layout_c.noisy_tail_len()
    prefix = layout_c.length - tail
    assert decode_rank(layout_c, tail) is not None

    z0 = jax.random.normal(jax.random.PRNGKey(0),
                           (N_GEN, hl, wl, cfg.in_channels), dtype)
    clean = jax.random.normal(jax.random.PRNGKey(1),
                              (N_CLEAN, hl, wl, cfg.in_channels), dtype)
    # REAL random init (not zeros): zero weights collapse the network to a
    # constant and would make any schedule look drift-free
    params = model.init(jax.random.PRNGKey(2), batch_c, z0,
                        jnp.zeros((N_GEN,), dtype), clean)
    # the head (final_layer) is itself zero-initialised per reference parity
    # (LVM/model.py:240-244) — a fresh model predicts EXACTLY zero for any
    # context, which would again make every schedule trivially drift-free.
    # Re-roll those zero leaves so predictions are context-dependent.
    head = params["params"]["final_layer"]
    leaves, treedef = jax.tree.flatten(head)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    head = jax.tree.unflatten(treedef, [
        jax.random.normal(k, l.shape, l.dtype) * 0.05
        for k, l in zip(keys, leaves)])
    params["params"]["final_layer"] = head

    def run(interval):
        sched = SchedulerConfig(num_steps=STEPS, prediction_type="x1",
                                cfg_interval=interval)

        @jax.jit
        def clip(params, clean, z0):
            cache = model.apply(params, batch_c, clean, prefix,
                                method=VideoGPT.prefill)
            bias_c = decode_mask(batch_c.meta.tail(tail), batch_c.meta)
            bias_u = decode_mask(batch_u.meta, batch_u.meta)

            def denoise_cond(z, t):
                return model.apply(params, batch_c, z, t, cache, tail,
                                   bias_c, method=VideoGPT.decode)

            def denoise_pair(z, t):
                return (denoise_cond(z, t),
                        model.apply(params, batch_u, z, t, bias=bias_u))

            return sample_separate_cfg(z0, denoise_pair, sched,
                                       cfg_scale=1.5,
                                       denoise_cond_fn=denoise_cond)

        return np.asarray(clip(params, clean, z0), np.float32), sched

    full, _ = run(None)
    denom = float(np.mean(full ** 2))
    for spec in INTERVALS.split(";"):
        if spec.strip() in ("", "none"):
            continue
        interval = tuple(float(x) for x in spec.split(","))
        out, sched = run(interval)
        mse = float(np.mean((out - full) ** 2))
        flags = cfg_step_flags(sched)
        print(json.dumps({
            "cfg_interval": interval,
            "steps_guided": int(sum(flags)),
            "steps_total": STEPS,
            "rel_final_latent_mse": round(mse / denom, 6),
            "flags": [int(f) for f in flags],
        }), flush=True)


if __name__ == "__main__":
    main()
