"""Break down the long-rollout bench (24+24 frames, window 80) per stage.

The rollout's warm time (bench_suite.bench_long_rollout) is far above the
trunk MXU floor; this script times each jitted stage of the exact same
rollout separately so the gap is attributable:

  vae_encode_8      8 condition frames -> latents
  prefill_b0        clean-prefix prefill, 8 frames
  denoise_b0        10-step CFG denoise scan over block 0
  vae_decode_24     24 latents -> pixels (runs twice per rollout)
  extend_b1         24 recycled frames appended to the cache
  denoise_b1        10-step CFG denoise scan over block 1
  postprocess_24    device->host + uint8 conversion + PIL

Token counts depend on the geometry: at the default 176x320 (222-token
frame seg) prefill is 1776 tokens, the tails 5328, keys 7104/12432; at
H=240 W=320 (the plane.mp4 bench bucket, 302-token seg) they are 2416 /
7248 / 9664 / 16912.

Env: H (176), W (320), STEPS (10), CFG_INTERVAL ("0.15,0.7" | "none"),
REPS (3).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from video_gpt_tpu.config import ModelConfig
from video_gpt_tpu.data.processor import postprocess_frames, preprocess_frames
from video_gpt_tpu.layout import frame_block_inference_layout, tokens_per_frame
from video_gpt_tpu.models.vae import AutoencoderKL, VAEConfig
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.sampling.pipeline import VideoGPTPipeline

# NOTE: default geometry is the flagship 176x320 bucket (222-token frame
# seg). bench_suite's plane.mp4 long-rollout leg preprocesses to 240x320
# (302-token seg, ~1.9x the attention work) — set H=240 W=320 to profile
# THAT leg's stages; mismatched geometry here once read as a phantom 6s
# "overhead gap" (DESIGN.md item 40).
H = int(os.environ.get("H", 176))
W = int(os.environ.get("W", 320))
STEPS = int(os.environ.get("STEPS", 10))
REPS = int(os.environ.get("REPS", 3))
_ival = os.environ.get("CFG_INTERVAL", "none")
CFG_INTERVAL = (None if _ival in ("none", "") else
                tuple(float(x) for x in _ival.split(",")))
N_COND, GEN = 8, 24


def _force(out):
    """d2h-force: on this backend block_until_ready returns immediately
    while the executable is still being remote-compiled (timings read ~0
    and stages queue concurrently); a device->host transfer is the only
    reliable barrier for the FIRST call of a new jit signature."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])


def timed(label, fn, *args, big_out: bool = False):
    """``big_out``: the result is HBM-significant (a grown KV cache) — drop
    the warmup/rep results before the next call so two copies never
    coexist, and produce the kept output with the final call."""
    t0 = time.perf_counter()
    out = fn(*args)
    _force(out)
    compile_s = time.perf_counter() - t0
    if big_out:
        del out
    ts = []
    for _ in range(REPS - (1 if big_out else 0)):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    if big_out:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:<20s} {ts[len(ts) // 2]:.4f}s   "
          f"(first incl. compile {compile_s:.1f}s)", flush=True)
    return out


def main():
    cfg = ModelConfig()
    dtype = jnp.bfloat16
    model = VideoGPT(cfg, dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    hl, wl = H // 8, W // 8
    n_img = tokens_per_frame(H, W)

    lay = frame_block_inference_layout(1, 1, n_img, use_cfg=False)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), Batch.from_layout(lay),
        jnp.zeros((1, hl, wl, 4), dtype), jnp.zeros((1,), dtype),
        jnp.zeros((1, hl, wl, 4), dtype)))
    params = jax.tree.map(lambda s: jnp.zeros(
        s.shape, dtype if jnp.issubdtype(s.dtype, jnp.floating)
        else s.dtype), shapes)
    vshapes = jax.eval_shape(lambda: vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3), dtype),
        jax.random.PRNGKey(2), True))
    vparams = jax.tree.map(lambda s: jnp.zeros(
        s.shape, dtype if jnp.issubdtype(s.dtype, jnp.floating)
        else s.dtype), vshapes)
    pipe = VideoGPTPipeline(model=model, params=params, vae=vae,
                            vae_params=vparams)

    px = jnp.zeros((N_COND, H, W, 3), dtype)
    rng = jax.random.PRNGKey(0)
    lat8 = timed("vae_encode_8", pipe._encode, vparams, px, rng)

    # ---- block 0: 8 clean -> 24 noisy --------------------------------------
    lay_c0 = frame_block_inference_layout(N_COND, GEN, n_img, use_cfg=False)
    lay_u = frame_block_inference_layout(0, GEN, n_img, use_cfg=False)
    b_c0, b_u = Batch.from_layout(lay_c0), Batch.from_layout(lay_u)
    tail = lay_c0.noisy_tail_len()
    prefix0 = lay_c0.length - tail
    z = jax.random.normal(jax.random.PRNGKey(3), (GEN, hl, wl, 4), dtype)

    cache0 = timed(f"prefill_b0({prefix0})", pipe._prefill_fn(prefix0),
                   params, b_c0, lat8, big_out=True)
    fn0 = pipe._denoise_fn(tail, STEPS, 1.0, "x1", True, 1.5,
                           columnar=True, cached=True,
                           cfg_interval=CFG_INTERVAL)
    samples = timed(f"denoise_b0(k={lay_c0.length})", fn0, params, b_c0,
                    b_u, cache0, z)

    out_px = timed("vae_decode_24", pipe._decode, vparams, samples)

    t0 = time.perf_counter()
    postprocess_frames(np.asarray(out_px, np.float32))
    print(f"{'postprocess_24':<18s} {time.perf_counter() - t0:.4f}s")

    # ---- block 1: 32 clean (8 cond + 24 recycled) -> 24 noisy --------------
    n_clean1 = N_COND + GEN
    lay_c1 = frame_block_inference_layout(n_clean1, GEN, n_img,
                                          use_cfg=False)
    b_c1 = Batch.from_layout(lay_c1)
    seg = n_img + 2
    del out_px, lat8
    cache1 = timed(f"extend_b1({GEN * seg})",
                   pipe._extend_fn(N_COND * seg, GEN * seg, N_COND),
                   params, b_c1, samples, cache0, big_out=True)
    del cache0
    fn1 = pipe._denoise_fn(tail, STEPS, 1.0, "x1", True, 1.5,
                           columnar=True, cached=True,
                           cfg_interval=CFG_INTERVAL)
    timed(f"denoise_b1(k={lay_c1.length})", fn1, params, b_c1, b_u,
          cache1, z)


if __name__ == "__main__":
    main()
