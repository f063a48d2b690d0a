"""Cross-block KV-cache growth == fresh prefill (exact path).

The reference re-runs the whole clean prefix through the transformer at
every autoregressive block (LVM/pipeline.py:418-422, with the KV cache
disabled); here the previous block's predictions are appended to the cache
as clean segments (OmniGen/scheduler.py:155-176 pattern, extended across
blocks). Exactness holds because clean positions always start at 0 and the
separate-CFG conditional row is pad-free.
"""
import numpy as np

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import ModelConfig
from video_gpt_tpu.layout import frame_block_inference_layout
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
import pytest

pytestmark = pytest.mark.slow

N_IMG, HL, WL, C = 4, 4, 4, 4


def test_extend_cache_equals_fresh_prefill():
    cfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=8)
    model = VideoGPT(cfg, dtype=jnp.float32)
    n1, gen = 2, 2          # block 0: 2 clean; block 1: 4 clean
    n2 = n1 + gen
    lay1 = frame_block_inference_layout(n1, gen, N_IMG, use_cfg=False)
    lay2 = frame_block_inference_layout(n2, gen, N_IMG, use_cfg=False)
    b1, b2 = Batch.from_layout(lay1), Batch.from_layout(lay2)
    tail1 = lay1.noisy_tail_len()
    prefix1 = lay1.length - tail1
    tail2 = lay2.noisy_tail_len()
    prefix2 = lay2.length - tail2
    seg = N_IMG + 2
    assert prefix1 == n1 * seg and prefix2 == n2 * seg

    cl_all = jax.random.normal(jax.random.PRNGKey(0), (n2, HL, WL, C))
    z = jnp.zeros((gen, HL, WL, C))
    params = model.init(jax.random.PRNGKey(1), b1, z, jnp.zeros((gen,)),
                        cl_all[:n1])

    fresh = model.apply(params, b2, cl_all, prefix2, method=VideoGPT.prefill)
    c1 = model.apply(params, b1, cl_all[:n1], prefix1,
                     method=VideoGPT.prefill)
    grown = model.apply(params, b2, cl_all[n1:], c1, gen * seg, n1,
                        method=VideoGPT.extend_cache)

    assert grown.k.shape == fresh.k.shape
    np.testing.assert_allclose(np.asarray(grown.k), np.asarray(fresh.k),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grown.v), np.asarray(fresh.v),
                               atol=1e-5, rtol=1e-5)

    # and decoding against either cache agrees
    t = jnp.full((gen,), 0.4)
    zr = jax.random.normal(jax.random.PRNGKey(2), (gen, HL, WL, C))
    out_f = model.apply(params, b2, zr, t, fresh, tail2,
                        method=VideoGPT.decode)
    out_g = model.apply(params, b2, zr, t, grown, tail2,
                        method=VideoGPT.decode)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_f),
                               atol=1e-5, rtol=1e-5)


def test_extend_mask_collapse_matches_dense_rule():
    """extend_mask's columnar collapse (q_index >= vis_start[k], valid for
    clean queries regardless of keys) must agree BIT-FOR-BIT in masking
    with the general metadata rule, evaluated through the actual split
    decode kernel (interpret mode)."""
    from video_gpt_tpu.models.video_gpt import extend_mask
    from video_gpt_tpu.ops.attention import AttnMeta, mha_reference
    from video_gpt_tpu.ops.attention import attention_bias
    from video_gpt_tpu.ops.flash_attention import flash_mha_decode_split

    n1, gen = 2, 2
    n2 = n1 + gen
    lay = frame_block_inference_layout(n2, gen, N_IMG, use_cfg=False)
    batch = Batch.from_layout(lay)
    seg = N_IMG + 2
    old, new = n1 * seg, gen * seg
    sl = slice(old, old + new)
    q_meta = AttnMeta(*(x[:, sl] for x in batch.meta))
    k_meta = AttnMeta(*(x[:, :old + new] for x in batch.meta))
    # extend queries are clean tokens — the premise of the collapse
    assert (np.asarray(q_meta.q_block) == -1).all()

    h, hkv, d = 2, 2, 8
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (1, new, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (1, hkv, old + new, d))
    v = jax.random.normal(jax.random.PRNGKey(5), (1, hkv, old + new, d))
    mask = extend_mask(q_meta, k_meta)

    got = flash_mha_decode_split(q, k[:, :, :old], v[:, :, :old],
                                 k[:, :, old:], v[:, :, old:], mask,
                                 interpret=True)
    bias = attention_bias(q_meta, k_meta, jnp.float32)
    want = mha_reference(q, k, v, bias, kv_heads_major=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_uses_extension_and_is_deterministic():
    from video_gpt_tpu.models.vae import AutoencoderKL, VAEConfig
    from video_gpt_tpu.sampling.pipeline import VideoGPTPipeline
    cfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=192)
    model = VideoGPT(cfg, dtype=jnp.float32)
    vae = AutoencoderKL(VAEConfig.tiny(), dtype=jnp.float32)
    H = W = 48
    lay = frame_block_inference_layout(2, 1, 9, use_cfg=False)
    z = jnp.zeros((1, H // 8, W // 8, 4))
    cl = jnp.zeros((2, H // 8, W // 8, 4))
    params = model.init(jax.random.PRNGKey(1), Batch.from_layout(lay), z,
                        jnp.zeros((1,)), cl)
    vparams = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, H, W, 3)),
                       jax.random.PRNGKey(3), True)
    pipe = VideoGPTPipeline(model=model, params=params, vae=vae,
                            vae_params=vparams)
    frames = [np.zeros((H, W, 3), np.uint8), np.full((H, W, 3), 128,
                                                     np.uint8)]
    out, lat = pipe.generate(frames, gen_nums=[1, 1, 1],
                             num_inference_steps=2,
                             img_guidance_scale=1.5,
                             clean_image_noise_level=0.0,  # exact reuse
                             max_input_image_size=48, max_frame_window=8,
                             seed=5, return_latents=True)
    assert len(lat) == 3
    keys = list(pipe.__dict__.get("_block_fns", {}))
    assert any(k[0] == "extend" for k in keys), keys
    # prefill happened once (block 0); blocks 1-2 extended
    assert sum(1 for k in keys if k[0] == "prefill") == 1
    out2, lat2 = pipe.generate(frames, gen_nums=[1, 1, 1],
                               num_inference_steps=2,
                               img_guidance_scale=1.5,
                               clean_image_noise_level=0.0,
                               max_input_image_size=48, max_frame_window=8,
                               seed=5, return_latents=True)
    for a, b in zip(lat, lat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
