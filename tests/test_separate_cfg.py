"""Separate-CFG equals the padded CFG pair.

The reference's LVM path runs the CFG pair as ONE batch where the
unconditional row is left-padded to the conditional row's length
(LVM/pipeline.py:436-448, LVM/processor.py:366-421); the OmniGen ancestor
has the pad-free separate evaluation (OmniGen/model.py:376-402). The
pipeline uses the separate form for speed — this test pins that it is
numerically the padded form.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import ModelConfig, SchedulerConfig
from video_gpt_tpu.layout import frame_block_inference_layout
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.sampling.scheduler import sample, sample_separate_cfg

N_CLEAN, N_GEN, N_IMG, HL, WL, C = 2, 2, 4, 4, 4, 4


def _setup():
    cfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=8)
    model = VideoGPT(cfg, dtype=jnp.float32)
    lay = frame_block_inference_layout(N_CLEAN, N_GEN, N_IMG, use_cfg=True)
    batch = Batch.from_layout(lay)
    z = jax.random.normal(jax.random.PRNGKey(0), (N_GEN, HL, WL, C))
    clean = jax.random.normal(jax.random.PRNGKey(1), (N_CLEAN, HL, WL, C))
    z2 = jnp.concatenate([z, z], axis=0)
    params = model.init(jax.random.PRNGKey(2), batch, z2,
                        jnp.zeros((2 * N_GEN,)), clean)
    return model, params, batch, z, clean


@pytest.mark.slow
def test_separate_cfg_matches_padded_pair():
    model, params, batch, z, clean = _setup()
    sched = SchedulerConfig(num_steps=3, prediction_type="x1")
    scale = 1.7

    # padded pair: one batch, uncond row left-padded to cond length
    def denoise_padded(zz, t):
        return model.apply(params, batch, zz, t, clean)

    padded = sample(jnp.concatenate([z, z], axis=0), denoise_padded, sched,
                    use_cfg=True, cfg_scale=scale)[:N_GEN]

    # separate: each context at its natural length
    lay_c = frame_block_inference_layout(N_CLEAN, N_GEN, N_IMG, use_cfg=False)
    lay_u = frame_block_inference_layout(0, N_GEN, N_IMG, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(lay_c), Batch.from_layout(lay_u)

    def denoise_pair(zz, t):
        return (model.apply(params, batch_c, zz, t, clean),
                model.apply(params, batch_u, zz, t))

    sep = sample_separate_cfg(z, denoise_pair, sched, cfg_scale=scale)

    np.testing.assert_allclose(np.asarray(sep), np.asarray(padded),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_separate_cfg_prefill_decode_matches_padded_pair():
    """The pipeline's actual fast path: cond row decodes against a prefill
    cache, uncond is a tail-only full forward."""
    model, params, batch, z, clean = _setup()
    sched = SchedulerConfig(num_steps=2, prediction_type="x1")
    scale = 1.3

    def denoise_padded(zz, t):
        return model.apply(params, batch, zz, t, clean)

    padded = sample(jnp.concatenate([z, z], axis=0), denoise_padded, sched,
                    use_cfg=True, cfg_scale=scale)[:N_GEN]

    lay_c = frame_block_inference_layout(N_CLEAN, N_GEN, N_IMG, use_cfg=False)
    lay_u = frame_block_inference_layout(0, N_GEN, N_IMG, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(lay_c), Batch.from_layout(lay_u)
    tail = lay_c.noisy_tail_len()
    prefix = lay_c.length - tail
    cache = model.apply(params, batch_c, clean, prefix,
                        method=VideoGPT.prefill)

    def denoise_pair(zz, t):
        return (model.apply(params, batch_c, zz, t, cache, tail,
                            method=VideoGPT.decode),
                model.apply(params, batch_u, zz, t))

    sep = sample_separate_cfg(z, denoise_pair, sched, cfg_scale=scale)
    np.testing.assert_allclose(np.asarray(sep), np.asarray(padded),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_cfg_interval_semantics():
    """CFG-interval schedule (SchedulerConfig.cfg_interval): a covering
    interval reproduces always-CFG exactly; an empty interval reproduces
    pure conditional sampling; a middle interval matches a hand-rolled
    Euler loop that guides only inside it."""
    from video_gpt_tpu.sampling.scheduler import (cfg_step_flags,
                                                  sigma_schedule)

    model, params, batch, z, clean = _setup()
    scale = 1.7
    lay_c = frame_block_inference_layout(N_CLEAN, N_GEN, N_IMG, use_cfg=False)
    lay_u = frame_block_inference_layout(0, N_GEN, N_IMG, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(lay_c), Batch.from_layout(lay_u)

    calls = {"uncond": 0}

    def denoise_cond(zz, t):
        return model.apply(params, batch_c, zz, t, clean)

    def denoise_pair(zz, t):
        calls["uncond"] += 1  # trace-time: counts compiled uncond forwards
        return (denoise_cond(zz, t), model.apply(params, batch_u, zz, t))

    sched = SchedulerConfig(num_steps=4, prediction_type="x1")
    always = sample_separate_cfg(z, denoise_pair, sched, cfg_scale=scale,
                                 denoise_cond_fn=denoise_cond)

    # covering interval == always-CFG, bit-for-bit
    cover = SchedulerConfig(num_steps=4, prediction_type="x1",
                            cfg_interval=(0.0, 2.0))
    assert cfg_step_flags(cover) == (True,) * 4
    out = sample_separate_cfg(z, denoise_pair, cover, cfg_scale=scale,
                              denoise_cond_fn=denoise_cond)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(always))

    # empty interval == no guidance at all; no uncond forward traced
    none_ = SchedulerConfig(num_steps=4, prediction_type="x1",
                            cfg_interval=(2.0, 3.0))
    assert cfg_step_flags(none_) == (False,) * 4
    calls["uncond"] = 0
    out = sample_separate_cfg(z, denoise_pair, none_, cfg_scale=scale,
                              denoise_cond_fn=denoise_cond)
    assert calls["uncond"] == 0
    plain = sample(z, denoise_cond, sched, use_cfg=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)

    # middle interval: matches a hand-rolled python Euler loop
    mid = SchedulerConfig(num_steps=4, prediction_type="x1",
                          cfg_interval=(0.2, 0.6))
    flags = cfg_step_flags(mid)
    assert True in flags and False in flags  # genuinely mixed
    out = sample_separate_cfg(z, denoise_pair, mid, cfg_scale=scale,
                              denoise_cond_fn=denoise_cond)
    sig = sigma_schedule(4)
    zz = z
    for i in range(4):
        t = jnp.full((zz.shape[0],), sig[i], zz.dtype)
        cond = denoise_cond(zz, t).astype(jnp.float32)
        if flags[i]:
            un = model.apply(params, batch_u, zz, t).astype(jnp.float32)
            pred = un + scale * (cond - un)
        else:
            pred = cond
        v = (pred - zz.astype(jnp.float32)) / (1.0 - sig[i])
        zz = (zz.astype(jnp.float32) + (sig[i + 1] - sig[i]) * v).astype(
            zz.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(zz),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_hybrid_batched_pair_matches_padded_pair():
    """bench.py's hybrid mode: B=1 prefill + zero-padded cache row for the
    uncond context + columnar rank mask on the padded pair layout."""
    from video_gpt_tpu.layout import decode_rank
    from video_gpt_tpu.models.video_gpt import decode_mask

    model, params, batch, z, clean = _setup()
    sched = SchedulerConfig(num_steps=2, prediction_type="x1")
    scale = 1.4

    def denoise_padded(zz, t):
        return model.apply(params, batch, zz, t, clean)

    padded = sample(jnp.concatenate([z, z], axis=0), denoise_padded, sched,
                    use_cfg=True, cfg_scale=scale)[:N_GEN]

    lay = frame_block_inference_layout(N_CLEAN, N_GEN, N_IMG, use_cfg=True)
    tail = lay.noisy_tail_len()
    assert decode_rank(lay, tail) is not None
    lay_c = frame_block_inference_layout(N_CLEAN, N_GEN, N_IMG, use_cfg=False)
    batch_c = Batch.from_layout(lay_c)
    prefix = lay_c.length - lay_c.noisy_tail_len()
    cache = model.apply(params, batch_c, clean, prefix,
                        method=VideoGPT.prefill)
    cache = jax.tree.map(
        lambda x: jnp.pad(x, ((0, 0), (0, 1)) + ((0, 0),) * (x.ndim - 2)),
        cache)
    dm = decode_mask(batch.meta.tail(tail), batch.meta)

    def denoise(zz, t):
        return model.apply(params, batch, zz, t, cache, tail, dm,
                           method=VideoGPT.decode)

    hybrid = sample(jnp.concatenate([z, z], axis=0), denoise, sched,
                    use_cfg=True, cfg_scale=scale)[:N_GEN]
    np.testing.assert_allclose(np.asarray(hybrid), np.asarray(padded),
                               rtol=2e-5, atol=2e-5)


def test_kinds_from_flags():
    """step_kinds helper semantics: refresh period, and the cache is
    invalidated when guidance is re-entered after a gap (never reuse an
    uncond prediction cached many sigmas earlier)."""
    from video_gpt_tpu.sampling.scheduler import _kinds_from_flags

    T, F = True, False
    assert _kinds_from_flags((T, T, T, T), 1) == ("cfg",) * 4
    assert _kinds_from_flags((T, T, T, T, T), 2) == (
        "cfg", "cfg_reuse", "cfg", "cfg_reuse", "cfg")
    assert _kinds_from_flags((F, T, T, T, F), 3) == (
        "cond", "cfg", "cfg_reuse", "cfg_reuse", "cond")
    # non-contiguous guided region: first step after re-entry is 'cfg'
    assert _kinds_from_flags((T, T, F, T, T), 2) == (
        "cfg", "cfg_reuse", "cond", "cfg", "cfg_reuse")
    assert _kinds_from_flags((T, F, T), 5) == ("cfg", "cond", "cfg")


@pytest.mark.slow
def test_uncond_refresh_matches_hand_rolled_loop():
    """uncond_refresh=k: guided steps between refreshes reuse the cached
    uncond prediction; matches a hand-rolled Euler loop with the same
    reuse rule, and the pair fn is traced exactly once (one lax.switch
    branch) even though kinds alternate every step."""
    from video_gpt_tpu.sampling.scheduler import sigma_schedule, step_kinds

    model, params, batch, z, clean = _setup()
    scale = 1.6
    lay_c = frame_block_inference_layout(N_CLEAN, N_GEN, N_IMG, use_cfg=False)
    lay_u = frame_block_inference_layout(0, N_GEN, N_IMG, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(lay_c), Batch.from_layout(lay_u)

    traces = {"pair": 0, "cond": 0}

    def denoise_cond(zz, t):
        traces["cond"] += 1
        return model.apply(params, batch_c, zz, t, clean)

    def denoise_pair(zz, t):
        traces["pair"] += 1
        return (model.apply(params, batch_c, zz, t, clean),
                model.apply(params, batch_u, zz, t))

    steps = 6
    sched = SchedulerConfig(num_steps=steps, prediction_type="x1",
                            uncond_refresh=2)
    kinds = step_kinds(sched)
    assert kinds == ("cfg", "cfg_reuse") * 3
    out = sample_separate_cfg(z, denoise_pair, sched, cfg_scale=scale,
                              denoise_cond_fn=denoise_cond)
    # O(1) traces in num_steps (the old per-run segmentation compiled ~steps
    # length-1 scans each embedding a full model forward)
    assert traces["pair"] == 1
    assert traces["cond"] == 1

    sig = sigma_schedule(steps)
    zz = z
    u_cache = None
    for i in range(steps):
        t = jnp.full((zz.shape[0],), sig[i], zz.dtype)
        cond = model.apply(params, batch_c, zz, t, clean)
        if kinds[i] == "cfg":
            u_cache = model.apply(params, batch_u, zz, t).astype(zz.dtype)
        pred = (u_cache.astype(jnp.float32)
                + scale * (cond.astype(jnp.float32)
                           - u_cache.astype(jnp.float32)))
        v = (pred - zz.astype(jnp.float32)) / (1.0 - sig[i])
        zz = (zz.astype(jnp.float32) + (sig[i + 1] - sig[i]) * v).astype(
            zz.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(zz),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_uncond_refresh_one_is_reference_semantics():
    """k=1 (the default) is bit-identical to the plain separate-CFG path."""
    model, params, batch, z, clean = _setup()
    scale = 1.5
    lay_c = frame_block_inference_layout(N_CLEAN, N_GEN, N_IMG, use_cfg=False)
    lay_u = frame_block_inference_layout(0, N_GEN, N_IMG, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(lay_c), Batch.from_layout(lay_u)

    def denoise_pair(zz, t):
        return (model.apply(params, batch_c, zz, t, clean),
                model.apply(params, batch_u, zz, t))

    base = sample_separate_cfg(
        z, denoise_pair, SchedulerConfig(num_steps=3, prediction_type="x1"),
        cfg_scale=scale)
    k1 = sample_separate_cfg(
        z, denoise_pair,
        SchedulerConfig(num_steps=3, prediction_type="x1", uncond_refresh=1),
        cfg_scale=scale)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(k1))


@pytest.mark.slow
def test_uncond_refresh_with_interval_and_fp32_preds():
    """Combined interval x refresh schedule through the switch path, with a
    pair fn whose outputs are fp32 while z0 is bf16 — the carry structure
    must not depend on the prediction dtype."""
    from video_gpt_tpu.sampling.scheduler import sigma_schedule, step_kinds

    model, params, batch, z, clean = _setup()
    scale = 1.4
    lay_c = frame_block_inference_layout(N_CLEAN, N_GEN, N_IMG, use_cfg=False)
    lay_u = frame_block_inference_layout(0, N_GEN, N_IMG, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(lay_c), Batch.from_layout(lay_u)
    zb = z.astype(jnp.bfloat16)

    def denoise_cond(zz, t):
        return model.apply(params, batch_c, zz.astype(jnp.float32),
                           t.astype(jnp.float32), clean)  # fp32 out

    def denoise_pair(zz, t):
        return (denoise_cond(zz, t),
                model.apply(params, batch_u, zz.astype(jnp.float32),
                            t.astype(jnp.float32)))

    steps = 8
    sched = SchedulerConfig(num_steps=steps, prediction_type="x1",
                            cfg_interval=(0.1, 0.8), uncond_refresh=2)
    kinds = step_kinds(sched)
    assert "cond" in kinds and "cfg" in kinds and "cfg_reuse" in kinds
    out = sample_separate_cfg(zb, denoise_pair, sched, cfg_scale=scale,
                              denoise_cond_fn=denoise_cond)
    assert out.dtype == jnp.bfloat16

    sig = sigma_schedule(steps)
    zz = zb
    u_cache = None
    for i in range(steps):
        t = jnp.full((zz.shape[0],), sig[i], zz.dtype)
        cond = denoise_cond(zz, t).astype(jnp.float32)
        if kinds[i] == "cfg":
            u_cache = denoise_pair(zz, t)[1].astype(zb.dtype)
        if kinds[i] == "cond":
            pred = cond
        else:
            pred = (u_cache.astype(jnp.float32)
                    + scale * (cond - u_cache.astype(jnp.float32)))
        v = (pred - zz.astype(jnp.float32)) / (1.0 - sig[i])
        zz = (zz.astype(jnp.float32) + (sig[i + 1] - sig[i]) * v).astype(
            zz.dtype)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(zz, np.float32),
                               rtol=2e-2, atol=2e-2)
