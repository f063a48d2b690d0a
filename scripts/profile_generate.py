"""Attribute the warm long-rollout wall time call-by-call.

scripts/profile_rollout.py times each jitted stage in isolation; the warm
``pipeline.generate`` wall is higher. This script wraps every cached jit
function of the pipeline with a synchronising timer, runs the exact
bench_suite long-rollout scenario warm, and prints per-call device time vs
the residual (host/work-between-calls) — so the gap is attributable.

Env: STEPS (10), CFG_INTERVAL ("0.15,0.7" | "none").
"""
import collections
import os
import time

import jax
import jax.numpy as jnp

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from video_gpt_tpu.utils.profiling import force_ready

H, W = 176, 320
STEPS = int(os.environ.get("STEPS", 10))
_ival = os.environ.get("CFG_INTERVAL", "0.15,0.7")
CFG_INTERVAL = (None if _ival in ("none", "") else
                tuple(float(x) for x in _ival.split(",")))
VIDS = os.environ.get("BENCH_VIDS", "/root/reference/vids")


def main():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench_suite import _full_pipeline, _read_frames

    pipe = _full_pipeline()
    frames = _read_frames(os.path.join(VIDS, "plane.mp4"), 8)
    kw = dict(gen_nums=[24, 24], num_inference_steps=STEPS,
              img_guidance_scale=1.5, max_input_image_size=W,
              max_frame_window=80, clean_image_noise_level=0.0, seed=0,
              cfg_interval=CFG_INTERVAL)

    t0 = time.perf_counter()
    out = pipe.generate(frames, **kw)
    print(f"first_incl_compile {time.perf_counter() - t0:.1f}s "
          f"({len(out)} frames)", flush=True)
    t0 = time.perf_counter()
    pipe.generate(frames, **kw)
    base_warm = time.perf_counter() - t0
    print(f"warm_unwrapped     {base_warm:.3f}s", flush=True)

    # wrap every cached jit fn with a sync timer (serialises dispatch, so
    # wrapped total >= unwrapped warm; the per-call numbers attribute it)
    acc = collections.defaultdict(float)
    calls = collections.Counter()

    def wrap(name, fn):
        def timed(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            acc[name] += time.perf_counter() - t0
            calls[name] += 1
            return out
        return timed

    for key in list(pipe._block_fns):
        pipe._block_fns[key] = wrap(str(key[0]) + str(key[1:3]),
                                    pipe._block_fns[key])
    for name in ("_encode", "_decode", "_decode_u8"):
        if name in pipe.__dict__:
            pipe.__dict__[name] = wrap(name, pipe.__dict__[name])

    t0 = time.perf_counter()
    pipe.generate(frames, **kw)
    total = time.perf_counter() - t0
    print(f"warm_wrapped       {total:.3f}s", flush=True)
    dev = 0.0
    for name, dt in sorted(acc.items(), key=lambda kv: -kv[1]):
        print(f"  {name:<28s} {dt:.3f}s  x{calls[name]}")
        dev += dt
    print(f"  {'(residual: host work)':<28s} {total - dev:.3f}s")


if __name__ == "__main__":
    main()
