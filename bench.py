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

Prints ONE JSON line carrying BOTH numbers: the headline ``value`` is the
serving schedule (default ``uncond_refresh=3``: the uncond context is
re-evaluated every 3rd step and its cached prediction reused in between —
rel. final-latent drift 3.9e-3 vs always-CFG measured THROUGH TRAINED
WEIGHTS by scripts/quality_protocol.py, artifacts/drift_frontier_r05.jsonl;
the r04 randomised-head sweep measured 3.7e-4), and
``always_cfg_*`` is reference semantics (guidance evaluated at every step,
LVM/scheduler.py:187-199). BENCH_UNCOND_REFRESH=1 BENCH_CFG_INTERVAL=none
makes the two identical.
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
# serving schedule knobs; drift vs always-CFG per schedule is measured
# through trained weights by scripts/quality_protocol.py
# (artifacts/drift_frontier_r05.jsonl; randomised-head sweep:
# scripts/cfg_drift.py, r04). Default: uncond_refresh=3, no interval —
# the drift-frontier winner (trained-weights rel MSE 3.9e-3 at 0.81x
# cost; the round-3 interval default measured 1.3e-2).
_ival = os.environ.get("BENCH_CFG_INTERVAL", "none")
CFG_INTERVAL = (None if _ival in ("none", "") else
                tuple(float(x) for x in _ival.split(",")))
UNCOND_REFRESH = int(os.environ.get("BENCH_UNCOND_REFRESH", 3))


def frontier_drift(cfg_interval, uncond_refresh, steps):
    """(drift, reference) for the serving schedule, from the committed
    frontier artifacts ((None, None) when not measured). Plain-teacher
    schedule rows only, trained-weights (r05) rows preferred over the
    randomised-head sweep (r04) — utils/frontier.py is the shared loader
    that keeps student-quality rows out of schedule-drift lookups."""
    import os.path

    from video_gpt_tpu.utils.frontier import load_schedule_drift
    here = os.path.dirname(os.path.abspath(__file__))
    if cfg_interval is None and uncond_refresh == 1 and steps == STEPS:
        return 0.0, "always-CFG (identical by construction)"
    row = load_schedule_drift(os.path.join(here, "artifacts")).get(
        (steps, uncond_refresh, 1.0, cfg_interval))
    if row is None:
        return None, None
    return row["rel_final_latent_mse"], row["reference"]


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
                            cfg_interval=CFG_INTERVAL,
                            uncond_refresh=UNCOND_REFRESH)
    sched_ref = SchedulerConfig(num_steps=STEPS, prediction_type="x1")

    assert decode_rank(layout, tail) is not None

    def make_cached_separate(sched_):
        """Separate-CFG: each context at its natural length (fewest
        attention elements, but two M=3552 trunk calls run ~20% under the
        batched matmul rate — see scripts/profile_decode.py). The schedule
        (cfg_interval / uncond_refresh) decides which steps evaluate the
        unconditional context."""
        @jax.jit
        def cached_clip_separate(params, clean, z0):
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

            return sample_separate_cfg(z0, denoise_pair, sched_,
                                       cfg_scale=1.5,
                                       denoise_cond_fn=denoise_cond)
        return cached_clip_separate

    cached_clip_separate = make_cached_separate(sched)

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

        # sched_ref: the padded batch structurally evaluates both CFG rows
        # every step (see mode selection below)
        return sample(z0, denoise, sched_ref, use_cfg=True, cfg_scale=1.5)

    @jax.jit
    def uncached_clip(params, clean, z0):
        # reference algorithm: full-sequence forward at every step, CFG pair
        # as one padded batch, KV cache disabled (LVM/scheduler.py:174)
        def denoise(z, t):
            return model.apply(params, batch, z, t, clean)

        # the baseline is the reference's algorithm: always-CFG semantics
        return sample(z0, denoise, sched_ref, use_cfg=True, cfg_scale=1.5)

    # separate-CFG measured faster than the batched B=2 pair on v5e (4.73s
    # vs 5.26s p50): XLA overlaps the two independent programs, hiding the
    # VPU-bound attention of one under the MXU-bound matmuls of the other
    mode = os.environ.get("BENCH_CFG_MODE", "separate")
    if mode == "separate":
        cached_clip = cached_clip_separate
        z0_fast = z0[:N_GEN]
    else:
        # the padded CFG batch evaluates BOTH rows at every step — interval/
        # refresh schedules cannot skip half a batch (ImageGenPipeline
        # raises for the same combination), so batched mode runs and
        # REPORTS always-CFG semantics regardless of the schedule knobs
        if CFG_INTERVAL is not None or UNCOND_REFRESH != 1:
            import sys
            print("BENCH_CFG_MODE=batched runs always-CFG semantics; "
                  "ignoring cfg_interval/uncond_refresh", file=sys.stderr)
        cached_clip = cached_clip_batched
        z0_fast = jnp.concatenate([z0[:N_GEN], z0[:N_GEN]], axis=0)
    from video_gpt_tpu.utils.profiling import force_ready

    def bench_fn(fn, z, reps):
        force_ready(fn(params, clean, z))  # compile barrier
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(params, clean, z).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return median(ts)

    t_serving = bench_fn(cached_clip, z0_fast, REPS)
    # analytic model-flops MFU: every number self-audits against the chip
    # ceiling. (XLA cost analysis is useless here: it counts scan bodies
    # once, and both the denoise loop and the layer stack are scans.)
    from video_gpt_tpu.sampling.scheduler import step_kinds
    from video_gpt_tpu.utils.profiling import (attention_flops, count_params,
                                               dense_model_flops, mfu)
    P = count_params(params)
    L_c, L_u, L_pair = layout_c.length, layout_u.length, layout.length

    def _attn(q, kv):
        return attention_flops(cfg.num_layers, cfg.hidden_size, q, kv)

    if mode == "separate":
        kinds = list(step_kinds(sched))
        uncond_evals = kinds.count("cfg")
        cond_evals = len(kinds)  # every step evaluates the cond branch
        flops_serving = (
            dense_model_flops(P, prefix) + _attn(prefix, prefix)  # prefill
            + cond_evals * (dense_model_flops(P, tail) + _attn(tail, L_c))
            + uncond_evals * (dense_model_flops(P, L_u) + _attn(L_u, L_u)))
    else:
        # batched mode: every step decodes the B=2 CFG pair's tails
        # against the padded pair cache (L_pair + 1 pad slot)
        flops_serving = (
            dense_model_flops(P, prefix) + _attn(prefix, prefix)
            + STEPS * (dense_model_flops(P, 2 * tail)
                       + 2 * _attn(tail, L_pair + 1)))
    flops_uncached = STEPS * (dense_model_flops(P, 2 * L_pair)
                              + 2 * _attn(L_pair, L_pair))
    # what actually ran: batched mode is always-CFG by construction
    eff_ival, eff_refresh = ((CFG_INTERVAL, UNCOND_REFRESH)
                             if mode == "separate" else (None, 1))
    ref_semantics = eff_ival is None and eff_refresh == 1
    if ref_semantics:
        t_always = t_serving
    else:
        t_always = bench_fn(make_cached_separate(sched_ref),
                            z0[:N_GEN], REPS)
    t_uncached = bench_fn(uncached_clip, z0, max(REPS - 1, 1))

    drift, drift_ref = frontier_drift(eff_ival, eff_refresh, STEPS)
    out = {
        "metric": "generated frames/sec/chip (16-frame clip prediction, "
                  f"{N_CLEAN}-frame condition, {STEPS} steps, 176x320, CFG)",
        "value": round(N_GEN / t_serving, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(t_uncached / t_serving, 3),
        "p50_latency_s": round(t_serving, 4),
        "serving_schedule": {"cfg_interval": eff_ival,
                             "uncond_refresh": eff_refresh},
        "serving_drift_rel_latent_mse": drift,
        "serving_drift_reference": drift_ref,
        # analytic model-flops MFU (2PT dense + QK/PV attention, per
        # schedule-evaluated branch, / wall / bf16 peak for this
        # device_kind — utils/profiling.py). Attention term is an upper
        # bound (masked tiles the kernels skip are still counted).
        "mfu": (round(m, 4) if (m := mfu(flops_serving, t_serving))
                is not None else None),
        "uncached_mfu": (round(m, 4)
                         if (m := mfu(flops_uncached, t_uncached))
                         is not None else None),
        "device_kind": jax.devices()[0].device_kind,
        "baseline_note": "vs_baseline = speedup over the reference's "
                         "no-KV-cache full-recompute algorithm on the same "
                         "chip (reference publishes no numbers). value = "
                         "serving schedule (drift vs always-CFG measured "
                         "through trained weights by scripts/"
                         "quality_protocol.py, committed at artifacts/"
                         "drift_frontier_r05.jsonl); always_cfg_* = "
                         "reference semantics, guidance at every step.",
    }
    if t_always is not None:
        out["always_cfg_fps"] = round(N_GEN / t_always, 3)
        out["always_cfg_p50_s"] = round(t_always, 4)
        out["always_cfg_vs_baseline"] = round(t_uncached / t_always, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
