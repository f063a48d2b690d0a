"""Attribute the warm long-rollout wall time phase by phase.

bench_suite.bench_long_rollout's warm time (~21.4s) exceeds the sum of the
individually-profiled jitted stages (~15.1s, scripts/profile_rollout.py).
This script runs the EXACT bench rollout through the real pipeline twice
(compile + warm), then a third time with every cached jitted callable
wrapped to (a) time its dispatch and (b) force completion with a 1-element
d2h read, so the gap is attributable to a phase instead of guessed at.

Env: STEPS (10), CFG_INTERVAL ("0.15,0.7" | "none").
"""
import os
import time

import jax
import numpy as np

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench_suite import _full_pipeline, _read_frames, VIDS, W

STEPS = int(os.environ.get("STEPS", 10))
_ival = os.environ.get("CFG_INTERVAL", "0.15,0.7")
CFG_INTERVAL = (None if _ival in ("none", "") else
                tuple(float(x) for x in _ival.split(",")))

pipe = _full_pipeline()
frames = _read_frames(os.path.join(VIDS, "plane.mp4"), 8)
kw = dict(gen_nums=[24, 24], num_inference_steps=STEPS,
          img_guidance_scale=1.5, max_input_image_size=W,
          max_frame_window=80, clean_image_noise_level=0.0, seed=0,
          cfg_interval=CFG_INTERVAL)

t0 = time.perf_counter()
pipe.generate(frames, **kw)
print(f"first (incl. compile): {time.perf_counter() - t0:.2f}s", flush=True)

t0 = time.perf_counter()
pipe.generate(frames, **kw)
warm = time.perf_counter() - t0
print(f"warm (unmodified):     {warm:.2f}s", flush=True)

# ---- instrumented pass: force each phase, attribute the wall time --------
phases = []


def _force(out):
    # every callable is already compiled by the two prior passes, so
    # block_until_ready is a true execution barrier here (its only failure
    # mode on this backend is DURING remote compilation); a d2h reshape
    # of a multi-GB KV cache would allocate a device copy and OOM
    jax.block_until_ready(out)
    return out


def wrap(name, fn):
    def wrapped(*a, **k):
        t = time.perf_counter()
        out = fn(*a, **k)
        d = time.perf_counter() - t
        t = time.perf_counter()
        _force(out)
        f = time.perf_counter() - t
        phases.append((name, d, f))
        return out
    return wrapped


for key, fn in list(pipe._block_fns.items()):
    pipe._block_fns[key] = wrap(str(key), fn)
pipe.__dict__["_encode"] = wrap("vae_encode", pipe._encode)
pipe.__dict__["_decode_u8"] = wrap("vae_decode_u8", pipe._decode_u8)

t0 = time.perf_counter()
pipe.generate(frames, **kw)
forced = time.perf_counter() - t0
print(f"warm (forced):         {forced:.2f}s", flush=True)

tot = 0.0
for name, d, f in phases:
    print(f"  {name:<70s} dispatch {d:7.3f}s  force {f:7.3f}s")
    tot += d + f
print(f"  sum of phases: {tot:.2f}s; unattributed (host/PIL/emit): "
      f"{forced - tot:.2f}s")
