"""Quality-drift measurement for serving schedules.

Compares the final denoised latents of a candidate serving schedule —
any combination of

- ``cfg_interval`` (uncond forwards skipped outside the sigma interval,
  SchedulerConfig.cfg_interval, arXiv:2404.07724),
- ``uncond_refresh=k`` (cached uncond prediction reused between every
  k-th guided step, SchedulerConfig.uncond_refresh, DeepCache-style
  arXiv:2312.00858),
- fewer denoise steps / shifted sigma grids (``steps``, ``shift`` —
  LVM/scheduler.py:119-130 exposes the same time-shifted grid),

against the REFERENCE trajectory: ``BENCH_STEPS`` steps, guidance at every
step (LVM/scheduler.py:187-199 semantics), at the flagship geometry
(8-frame condition, 16-frame clip, 176x320) with RANDOM initialised
weights — no released checkpoint exists to measure against, so this bounds
the *trajectory divergence the schedule itself introduces* through a real
(randomly initialised) network, not perceptual quality.

Reports per schedule: relative final-latent MSE
``mean((z_sched - z_ref)^2) / mean(z_ref^2)``, the per-step evaluation
plan, and the schedule's cost in model-forward units (cond evaluations +
uncond evaluations; the uncond context has no clean prefix, so one uncond
forward costs ~0.47 of a step at flagship shapes — DESIGN.md decode
breakdown). One JSON line per schedule.

Env:
  NUM_LAYERS    default 8 (full depth unnecessary for trajectory dynamics)
  BENCH_STEPS   reference step count (default 10)
  SCHEDULES     ';'-separated specs, each ','-separated key=val with keys
                steps, shift, ival (lo:hi or none), k —
                e.g. "ival=0.15:0.7,k=2;steps=8,shift=1.0,ival=0.15:0.7"
                (missing keys default to steps=BENCH_STEPS, shift=1, no
                interval, k=1). Default: the frontier sweep below.
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
from video_gpt_tpu.sampling.scheduler import sample_separate_cfg, step_kinds

N_CLEAN, N_GEN, H, W = 8, 16, 176, 320
STEPS = int(os.environ.get("BENCH_STEPS", 10))
NUM_LAYERS = int(os.environ.get("NUM_LAYERS", 8))
DEFAULT_SWEEP = (
    # interval-only rows (round-3 sweep, kept comparable)
    "ival=0.15:0.7;ival=0.0:0.75;ival=0.2:0.6;"
    # uncond-refresh on top of the serving interval
    "ival=0.15:0.7,k=2;ival=0.15:0.7,k=3;k=2;k=3;"
    # fewer-step schedules (ask: frames/s-vs-drift frontier)
    "steps=8;steps=8,ival=0.15:0.7;steps=8,ival=0.15:0.7,k=2;"
    "steps=6;steps=6,ival=0.15:0.7;steps=6,shift=1.5,ival=0.15:0.7;"
    "steps=5,ival=0.15:0.7;steps=5,shift=1.5,ival=0.15:0.7;"
    # fewer-step x uncond-refresh (no interval) — the frontier points
    # bench_suite's serving_frontier legs and the README cite; the sweep
    # must regenerate EVERY row of artifacts/drift_frontier_r04.jsonl
    "steps=8,k=2;steps=8,k=3;steps=6,k=2;steps=6,k=3;steps=6,shift=1.5,k=2;"
    "steps=5,k=2;steps=5,k=3"
)
SCHEDULES = os.environ.get("SCHEDULES", DEFAULT_SWEEP)


def parse_schedule(spec: str):
    steps, shift, ival, k = STEPS, 1.0, None, 1
    for part in spec.split(","):
        key, _, val = part.strip().partition("=")
        if key == "steps":
            steps = int(val)
        elif key == "shift":
            shift = float(val)
        elif key == "ival":
            ival = (None if val in ("none", "") else
                    tuple(float(x) for x in val.split(":")))
        elif key == "k":
            k = int(val)
        elif key:
            raise ValueError(f"unknown schedule key {key!r} in {spec!r}")
    return SchedulerConfig(num_steps=steps, time_shifting_factor=shift,
                           prediction_type="x1", cfg_interval=ival,
                           uncond_refresh=k)


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

    def run(sched: SchedulerConfig):
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

        return np.asarray(clip(params, clean, z0), np.float32)

    ref_sched = SchedulerConfig(num_steps=STEPS, prediction_type="x1")
    full = run(ref_sched)
    denom = float(np.mean(full ** 2))
    for spec in SCHEDULES.split(";"):
        if not spec.strip():
            continue
        sched = parse_schedule(spec)
        out = run(sched)
        mse = float(np.mean((out - full) ** 2))
        kinds = step_kinds(sched)
        n_uncond = sum(k == "cfg" for k in kinds)
        print(json.dumps({
            "schedule": spec.strip(),
            "num_steps": sched.num_steps,
            "time_shift": sched.time_shifting_factor,
            "cfg_interval": sched.cfg_interval,
            "uncond_refresh": sched.uncond_refresh,
            "steps_guided": int(sum(k != "cond" for k in kinds)),
            "uncond_evals": int(n_uncond),
            # cost relative to the reference schedule, in flagship
            # forward-units (uncond forward ~0.47 of a cond step)
            "rel_cost": round((sched.num_steps + 0.47 * n_uncond)
                              / (STEPS * 1.47), 4),
            "rel_final_latent_mse": round(mse / denom, 6),
            "kinds": "".join({"cfg": "G", "cfg_reuse": "r",
                              "cond": "."}[k] for k in kinds),
        }), flush=True)


if __name__ == "__main__":
    main()
