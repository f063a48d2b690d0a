"""Sequence-parallel SERVING vs the single-device pipeline.

The reference serves with SP=4 Ulysses (inference_nv.sh:23); here a CPU
device mesh makes parity a unit test: the full autoregressive pipeline —
prefill (head-sharded cache at rest), cached decode (tail-only
all_to_alls), separate-CFG uncond row, cross-block extension — must produce
the same latents sharded as unsharded.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import MeshConfig, ModelConfig
from video_gpt_tpu.layout import (frame_block_inference_layout,
                                  tokens_per_frame)
from video_gpt_tpu.models.vae import AutoencoderKL, VAEConfig
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.parallel.mesh import make_mesh
from video_gpt_tpu.parallel.ulysses import ulysses_attend_cached
from video_gpt_tpu.sampling.pipeline import VideoGPTPipeline

pytestmark = pytest.mark.slow


def _mesh(data=1, seq=2):
    if len(jax.devices()) < data * seq:
        pytest.skip("needs fake CPU devices")
    return make_mesh(MeshConfig(data=data, seq=seq))


CFG = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=192)


def _pipelines(seq):
    """Same params; one plain pipeline, one over a (1, seq) mesh."""
    model = VideoGPT(CFG, dtype=jnp.float32)
    vae = AutoencoderKL(VAEConfig.tiny(), dtype=jnp.float32)
    H = W = 48
    n = tokens_per_frame(H, W)
    lay = frame_block_inference_layout(2, 1, n, use_cfg=True)
    z = jnp.zeros((2, H // 8, W // 8, 4))
    cl = jnp.zeros((2, H // 8, W // 8, 4))
    params = model.init(jax.random.PRNGKey(1), Batch.from_layout(lay), z,
                        jnp.zeros((2,)), cl)
    # perturb: the tiny zero-init final layer would make every output 0
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
              for l, r in zip(leaves, rngs)]
    params = jax.tree.unflatten(treedef, leaves)
    vparams = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, H, W, 3)),
                       jax.random.PRNGKey(3), True)
    plain = VideoGPTPipeline(model=model, params=params, vae=vae,
                             vae_params=vparams)
    sp_cfg = dataclasses.replace(CFG, seq_shard=True,
                                 sp_attention="ulysses")
    sharded = VideoGPTPipeline(model=VideoGPT(sp_cfg, dtype=jnp.float32),
                               params=params, vae=vae, vae_params=vparams,
                               mesh=_mesh(seq=seq))
    return plain, sharded


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


def test_sp_pipeline_matches_single_device():
    plain, sharded = _pipelines(seq=2)
    frames = _frames(2)
    # two blocks with CFG: exercises prefill, cached decode, the uncond
    # tail-only row, and the cross-block cache-extend path (noise level 0)
    kw = dict(gen_nums=[1, 1], num_inference_steps=2,
              img_guidance_scale=1.5, max_input_image_size=48,
              max_frame_window=8, clean_image_noise_level=0.0, seed=11,
              return_latents=True)
    _, want = plain.generate(frames, **kw)
    _, got = sharded.generate(frames, **kw)
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4)


def test_ulysses_uncached_self_pads_awkward_length():
    """The uncond CFG row at its natural (non-multiple) length: the
    uncached wrapper pads to the seq multiple and crops."""
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops.attention import AttnMeta, attend
    from video_gpt_tpu.parallel.ulysses import ulysses_attend

    mesh = _mesh(seq=4)
    n = tokens_per_frame(32, 32)
    layout = frame_block_inference_layout(0, 1, n, use_cfg=False)  # L=6
    meta = AttnMeta.from_layout(layout)
    b, l, h, d = layout.batch, layout.length, 4, 64
    assert l % 4 != 0  # the point of the test
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)
    dm = decode_mask(meta, meta)
    want = attend(q, k, v, meta, meta, impl="reference", bias=dm)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda q, k, v: ulysses_attend(
            q, k, v, meta, meta, impl="reference", bias=dm))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_cli_generate_mesh_seq_smoke(tmp_path):
    """`cli generate --mesh_seq 2` wires the mesh through to PNGs."""
    if len(jax.devices()) < 2:
        pytest.skip("needs fake CPU devices")
    from video_gpt_tpu.cli import build_parser
    args = build_parser().parse_args([
        "generate", "--video_path", "/root/reference/vids/plane.mp4",
        "--save_dir", str(tmp_path), "--clean_image_num", "2",
        "--gen_nums", "1", "--num_inference_steps", "2",
        "--max_input_image_size", "48", "--tiny_model", "--dtype", "fp32",
        "--mesh_seq", "2", "--seed", "3"])
    args.func(args)
    import os
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


@pytest.mark.parametrize("n_gen", [2, 1])
def test_ulysses_cached_matches_concat(n_gen):
    """The cached-attention collective path == plain concat attention.

    n_gen=2 -> tail 12 (divisible by sp=4); n_gen=1 -> tail 6, exercising
    the wrapper's self-padding (inference layouts come at their natural
    lengths; the reference serves SP=4 regardless of shape)."""
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops.attention import AttnMeta, attend

    mesh = _mesh(seq=4)
    n = tokens_per_frame(32, 32)  # 4 tokens/frame at patch 2? -> layout len
    layout = frame_block_inference_layout(2, n_gen, n, use_cfg=False)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l, h, d = layout.batch, layout.length, 4, 64
    lc = l - tail
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b, tail, h, d), jnp.float32)
    # heads-major lane-padded cache/tail K,V (the KVCache layout)
    dp = d + (-d % 128)
    ck = jnp.pad(jnp.asarray(rng.randn(b, h, lc, d), jnp.float32),
                 ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    cv = jnp.pad(jnp.asarray(rng.randn(b, h, lc, d), jnp.float32),
                 ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    kn = jnp.pad(jnp.asarray(rng.randn(b, h, tail, d), jnp.float32),
                 ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    vn = jnp.pad(jnp.asarray(rng.randn(b, h, tail, d), jnp.float32),
                 ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    dm = decode_mask(q_meta, meta)

    k_full = jnp.concatenate([ck, kn], axis=2)
    v_full = jnp.concatenate([cv, vn], axis=2)
    want = attend(q, k_full, v_full, q_meta, meta, impl="reference",
                  bias=dm, kv_heads_major=True)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda q, kn, vn, ck, cv: ulysses_attend_cached(
            q, kn, vn, ck, cv, q_meta, meta, impl="reference", bias=dm))(
            q, kn, vn, ck, cv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
