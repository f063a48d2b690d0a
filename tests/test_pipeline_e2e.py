"""End-to-end autoregressive video pipeline on CPU (tiny model, real frames).

Mirrors the reference's smoke-by-inference practice (SURVEY.md §4) but
asserted: frames from the bundled sample videos roll through VAE encode ->
layout -> prefill -> scan denoise -> VAE decode -> PIL, deterministically.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import ModelConfig
from video_gpt_tpu.layout import frame_block_inference_layout, tokens_per_frame
from video_gpt_tpu.models.vae import AutoencoderKL, VAEConfig
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.sampling.pipeline import VideoGPTPipeline

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipe():
    cfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=192)
    model = VideoGPT(cfg, dtype=jnp.float32)
    vae = AutoencoderKL(VAEConfig.tiny(), dtype=jnp.float32)
    H = W = 48
    n = tokens_per_frame(H, W)
    lay = frame_block_inference_layout(2, 1, n, use_cfg=True)
    z = jnp.zeros((2, H // 8, W // 8, 4))
    cl = jnp.zeros((2, H // 8, W // 8, 4))
    params = model.init(jax.random.PRNGKey(1), Batch.from_layout(lay), z,
                        jnp.zeros((2,)), cl)
    vparams = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, H, W, 3)),
                       jax.random.PRNGKey(3), True)
    return VideoGPTPipeline(model=model, params=params, vae=vae,
                            vae_params=vparams)


def _frames(n=2):
    import cv2
    cap = cv2.VideoCapture("/root/reference/vids/plane.mp4")
    out = []
    for i in range(n):
        cap.set(cv2.CAP_PROP_POS_FRAMES, i * 4)
        ok, f = cap.read()
        assert ok
        out.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return out


def test_autoregressive_rollout(pipe):
    frames = _frames(2)
    out = pipe.generate(frames, gen_nums=[1, 1], num_inference_steps=2,
                        img_guidance_scale=1.5, max_input_image_size=48,
                        max_frame_window=4, seed=11)
    # 2 round-tripped conditions + 2 generated
    assert len(out) == 4
    assert all(np.isfinite(np.asarray(im, np.float32)).all() for im in out)
    # determinism
    out2 = pipe.generate(frames, gen_nums=[1, 1], num_inference_steps=2,
                         img_guidance_scale=1.5, max_input_image_size=48,
                         max_frame_window=4, seed=11)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(out, out2))


def test_vae_roundtrip_recycle(pipe):
    """Reference recycled-frame parity mode (LVM/pipeline.py:491-498):
    block-2 conditions come from re-encoding the decoded pixels. Block-1
    output must be identical either way (the flag only changes what feeds
    the NEXT block); block-2 output must differ."""
    frames = _frames(2)
    # the fixture's zero-init final layer makes every sampled latent exactly
    # 0 (conditions can't influence the output); perturb the params so the
    # model is non-degenerate
    leaves, treedef = jax.tree.flatten(pipe.params)
    rngs = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
              for l, r in zip(leaves, rngs)]
    pipe = VideoGPTPipeline(model=pipe.model,
                            params=jax.tree.unflatten(treedef, leaves),
                            vae=pipe.vae, vae_params=pipe.vae_params)
    kw = dict(gen_nums=[1, 1], num_inference_steps=2,
              img_guidance_scale=1.5, max_input_image_size=48,
              max_frame_window=4, seed=11)
    base, base_lat = pipe.generate(frames, return_latents=True, **kw)
    rt, rt_lat = pipe.generate(frames, vae_roundtrip_recycle=True,
                               return_latents=True, **kw)
    assert len(rt) == len(base) == 4
    # block 1 identical either way (flag only changes what feeds block 2)
    assert np.array_equal(np.asarray(base_lat[0]), np.asarray(rt_lat[0]))
    # block 2 sees re-encoded conditions -> different latent
    assert not np.array_equal(np.asarray(base_lat[1]), np.asarray(rt_lat[1]))
    # deterministic under the flag
    rt2, rt2_lat = pipe.generate(frames, vae_roundtrip_recycle=True,
                                 return_latents=True, **kw)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(rt_lat, rt2_lat))


def test_no_cfg_and_latents(pipe):
    frames = _frames(2)
    out, lat = pipe.generate(frames, gen_nums=[1], num_inference_steps=2,
                             img_guidance_scale=1.0,  # disables CFG
                             max_input_image_size=48, seed=3,
                             return_latents=True)
    assert len(out) == 3 and len(lat) == 1
    # latent geometry matches the (aspect-preserving) output frames
    w, h = out[-1].size
    assert lat[0].shape == (h // 8, w // 8, 4)


def test_generate_batch_matches_independent_calls(pipe):
    """generate_batch: N same-shaped videos ride one B=N program set with
    per-video PRNG streams — outputs match N independent generate() calls
    (the reference can only loop one video at a time)."""
    frames_a = _frames(2)
    # a second "video": the same clip shifted, so rows genuinely differ
    frames_b = [np.roll(f, 7, axis=1) for f in frames_a]
    # perturb the zero-init head so conditions influence outputs
    leaves, treedef = jax.tree.flatten(pipe.params)
    rngs = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
              for l, r in zip(leaves, rngs)]
    p = VideoGPTPipeline(model=pipe.model,
                         params=jax.tree.unflatten(treedef, leaves),
                         vae=pipe.vae, vae_params=pipe.vae_params)
    kw = dict(gen_nums=[1, 1], num_inference_steps=2,
              img_guidance_scale=1.5, max_input_image_size=48,
              max_frame_window=4, clean_image_noise_level=0.1)
    want_a = p.generate(frames_a, seed=21, **kw)
    want_b = p.generate(frames_b, seed=22, **kw)
    got = p.generate_batch([frames_a, frames_b], seeds=[21, 22], **kw)
    assert len(got) == 2
    for got_i, want_i in zip(got, (want_a, want_b)):
        assert len(got_i) == len(want_i)
        for a, b in zip(got_i, want_i):
            # identical math per row; batched matmul reduction order may
            # differ by an ulp, which can flip a rounded uint8 pixel
            np.testing.assert_allclose(np.asarray(a, np.int32),
                                       np.asarray(b, np.int32), atol=1)


def test_generate_batch_rejects_mixed_shapes(pipe):
    frames_a = _frames(2)
    small = [f[:100] for f in frames_a]
    with pytest.raises(ValueError):
        pipe.generate_batch([frames_a, small], gen_nums=[1],
                            num_inference_steps=1, max_input_image_size=48)


def test_window_slide_keeps_tail_and_reprefills(pipe):
    """Sliding-window semantics (LVM/pipeline.py:418-422): when
    n_clean + gen_num exceeds max_frame_window the OLDEST conditions are
    dropped before the block runs, the cross-block KV cache is reset
    (positions restart), and the initial emit round-trips only the KEPT
    window. 3 conditions + gen_nums=[2, 2] under window 4 slides at BOTH
    blocks: block 0 keeps conds [1:3], block 1 keeps the 2 frames block 0
    generated — so the cache can never be extended and prefill runs per
    block."""
    from video_gpt_tpu.data.processor import (postprocess_frames,
                                              preprocess_frames)
    frames = _frames(3)
    kw = dict(gen_nums=[2, 2], num_inference_steps=2,
              img_guidance_scale=1.5, max_input_image_size=48,
              max_frame_window=4, clean_image_noise_level=0.0, seed=17)
    pipe.__dict__.pop("_block_fns", None)  # fresh jit-call ledger
    out = pipe.generate(frames, **kw)
    # 2 kept round-tripped conditions (NOT 3) + 2 + 2 generated
    assert len(out) == 6
    keys = list(pipe.__dict__.get("_block_fns", {}))
    assert sum(1 for k in keys if k[0] == "prefill") >= 1
    assert not any(k[0] == "extend" for k in keys), keys

    # the emitted conditions are the VAE round-trip of the LAST two inputs:
    # encode happens on all 3 frames BEFORE the slide (same rng draw), so
    # the kept rows are exactly encode(all)[1:]
    rng = jax.random.PRNGKey(17)
    _, erng = jax.random.split(rng)
    px = preprocess_frames(frames, 48)
    lat = pipe._encode(pipe.vae_params, jnp.asarray(px, pipe.model.dtype),
                       erng)
    want = postprocess_frames(np.asarray(
        pipe._decode_u8(pipe.vae_params, lat[1:])))
    for got_im, want_im in zip(out[:2], want):
        np.testing.assert_array_equal(np.asarray(got_im),
                                      np.asarray(want_im))

    # determinism across a repeat (jit functions now cached)
    out2 = pipe.generate(frames, **kw)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(out, out2))

    # the batched path slides identically (clean_all[:, drop:])
    got = pipe.generate_batch([frames], seeds=[17], **kw)
    assert len(got) == 1 and len(got[0]) == 6
    for a, b in zip(got[0], out):
        np.testing.assert_allclose(np.asarray(a, np.int32),
                                   np.asarray(b, np.int32), atol=1)


def test_empty_inputs_raise_and_overlong_block_slides_to_zero(pipe):
    with pytest.raises(ValueError, match="at least one conditioning"):
        pipe.generate([], gen_nums=[1], num_inference_steps=1,
                      max_input_image_size=48)
    # a block larger than the remaining window slides the conditions to
    # ZERO (n_clean 1 + gen 5 > window 4 drops 2 >= n_clean) — the block
    # then runs uncached (prefix 0) and still emits every frame
    out = pipe.generate(_frames(1), gen_nums=[5], num_inference_steps=1,
                        max_frame_window=4, img_guidance_scale=1.0,
                        max_input_image_size=48, seed=2)
    assert len(out) == 5


def test_uncond_refresh_wired_through_generate(pipe):
    """generate(uncond_refresh=k) reaches the sampler: k=1 equals the
    default bit-for-bit; k=2 over a mixed interval runs and differs from
    always-refresh (the cached uncond prediction is actually reused)."""
    frames = _frames(2)
    # non-degenerate params (fixture head is zero-init)
    leaves, treedef = jax.tree.flatten(pipe.params)
    rngs = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
              for l, r in zip(leaves, rngs)]
    pipe = VideoGPTPipeline(model=pipe.model,
                            params=jax.tree.unflatten(treedef, leaves),
                            vae=pipe.vae, vae_params=pipe.vae_params)
    kw = dict(gen_nums=[1], num_inference_steps=4, img_guidance_scale=1.5,
              max_input_image_size=48, seed=5, return_latents=True)
    _, base = pipe.generate(frames, **kw)
    _, k1 = pipe.generate(frames, uncond_refresh=1, **kw)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(k1[0]))
    _, k2 = pipe.generate(frames, uncond_refresh=2, **kw)
    assert np.isfinite(np.asarray(k2[0], np.float32)).all()
    assert not np.array_equal(np.asarray(base[0]), np.asarray(k2[0]))
