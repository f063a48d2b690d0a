"""Host-offloaded AdamW (training/offload.py) parity vs the optax step.

The full-depth single-chip capability (VERDICT r2 #5; the TPU analogue of
the reference's stage3_offload_bf16_dp.json) keeps f32 master/mu/nu in host
memory and updates them with host compute. On the CPU test backend the
memory kinds collapse to default memory (compute_on deadlocks there — see
host_sharding), so what THIS file pins is the optimizer math: the offload
step must walk the exact same trajectory as train_state.make_train_step's
optax chain (clip-by-global-norm -> AdamW -> weight decay -> schedule).
Placement on real HBM/host memory is exercised by the bench_suite
``train_stage1_fulldepth`` leg on the TPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import ModelConfig, TrainConfig
from video_gpt_tpu.models.video_gpt import VideoGPT
from video_gpt_tpu.training.offload import (OffloadState,
                                            init_offload_state,
                                            make_offload_train_step)
from video_gpt_tpu.training.train_state import (init_train_state,
                                                make_train_step)

from test_training import _inputs

pytestmark = pytest.mark.slow

CFG = ModelConfig.tiny(attn_impl="reference")


def _setup(seed=0):
    layout, inputs = _inputs(seed=seed)
    model = VideoGPT(CFG, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(3), inputs.batch, inputs.x1,
                        jnp.zeros((layout.num_noisy_frames,)),
                        inputs.clean_latents)
    tcfg = TrainConfig(lr=1e-3, lr_scheduler="constant", max_grad_norm=1.0)
    return layout, inputs, model, params, tcfg


@pytest.mark.parametrize("grad_splits", [1, 2])
def test_offload_step_matches_optax(grad_splits):
    """grad_splits=2 also pins that the partitioned backward (only half
    the tree accumulates per pass, identical rng) walks the SAME
    trajectory as the single-pass step."""
    layout, inputs, model, params, tcfg = _setup()

    ref_state = init_train_state(model, params, tcfg)
    ref_step = jax.jit(make_train_step(model, tcfg, max_blocks=3))

    off_params = jax.tree.map(jnp.copy, params)
    off_state = init_offload_state(off_params)
    # eager orchestrator — donates its inputs itself; do not re-jit
    off_step = make_offload_train_step(model, tcfg, max_blocks=3,
                                       grad_splits=grad_splits)

    for i in range(3):
        rng = jax.random.PRNGKey(100 + i)
        ref_state, ref_m = ref_step(ref_state, rng, inputs)
        off_params, off_state, off_m = off_step(off_params, off_state, rng,
                                                inputs)
        np.testing.assert_allclose(float(off_m["loss"]),
                                   float(ref_m["loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(off_m["grad_norm"]),
                                   float(ref_m["grad_norm"]), rtol=1e-5)

    ref_leaves = jax.tree.leaves(ref_state.params["params"])
    off_leaves = jax.tree.leaves(off_params["params"])
    assert len(ref_leaves) == len(off_leaves)
    for r, o in zip(ref_leaves, off_leaves):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-6)
    assert int(off_state.count) == 3


def test_offload_master_is_f32_and_bf16_params_refresh():
    """bf16 device params round through an f32 master: after a step the
    device tree is the bf16 cast of the f32 master (no double rounding)."""
    layout, inputs, model, params, tcfg = _setup(seed=1)
    bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x,
                        params)
    state = init_offload_state(bf16)
    for leaf in jax.tree.leaves(state.master):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state.mu):
        assert leaf.dtype == jnp.float32 and not leaf.any()

    step = make_offload_train_step(model, tcfg, max_blocks=3)
    new_params, state, m = step(bf16, state, jax.random.PRNGKey(0), inputs)
    assert np.isfinite(float(m["loss"]))
    for p, mst in zip(jax.tree.leaves(new_params["params"]),
                      jax.tree.leaves(state.master)):
        assert p.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(p), np.asarray(mst.astype(jnp.bfloat16)))


def test_offload_chunked_updates_match_whole_leaf(monkeypatch):
    """Force the axis-0 chunking (production: bounds each host-update
    program's HBM staging at 3.8B scale) onto the tiny test model and pin
    that the chunked trajectory is bit-identical to the optax step."""
    from video_gpt_tpu.training import offload as off_mod

    layout, inputs, model, params, tcfg = _setup(seed=2)
    monkeypatch.setattr(off_mod, "CHUNK_BYTES_F32", 2048)  # split a lot

    ref_state = init_train_state(model, params, tcfg)
    ref_step = jax.jit(make_train_step(model, tcfg, max_blocks=3))

    off_params = jax.tree.map(jnp.copy, params)
    off_state = init_offload_state(off_params)
    assert any(len(c) > 1 for c in jax.tree.leaves(
        off_state.master, is_leaf=lambda x: isinstance(x, tuple)))
    off_step = make_offload_train_step(model, tcfg, max_blocks=3)

    for i in range(2):
        rng = jax.random.PRNGKey(7 + i)
        ref_state, ref_m = ref_step(ref_state, rng, inputs)
        off_params, off_state, off_m = off_step(off_params, off_state,
                                                rng, inputs)
        np.testing.assert_allclose(float(off_m["loss"]),
                                   float(ref_m["loss"]), rtol=1e-5)
    for r, o in zip(jax.tree.leaves(ref_state.params["params"]),
                    jax.tree.leaves(off_params["params"])):
        assert r.shape == o.shape
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-6)


def test_chunk_sizes():
    from video_gpt_tpu.training.offload import chunk_sizes

    # under the bound: never split
    assert chunk_sizes(()) == (1,)
    assert chunk_sizes((32, 8, 8)) == (32,)
    # the 3.8B trunk leaf splits along axis 0 into near-even chunks
    sizes = chunk_sizes((32, 8192, 3072))
    assert sum(sizes) == 32 and len(sizes) > 1
    assert max(sizes) - min(sizes) <= 1
    assert max(sizes) * 8192 * 3072 * 4 <= 384 << 20  # hard per-chunk bound
    # few big rows: ceil-div on TOTAL bytes would pick k=2 -> a 400MB
    # chunk; the per-ROW rule gives one 200MB row per chunk
    rows_200mb = (200 << 20) // 4
    assert chunk_sizes((3, rows_200mb)) == (1, 1, 1)
    # a single row above the bound cannot split further: one row per chunk
    assert chunk_sizes((2, (500 << 20) // 4)) == (1, 1)


def test_offload_rejects_multisteps():
    _, _, model, _, _ = _setup()
    tcfg = TrainConfig(gradient_accumulation_steps=2)
    with pytest.raises(ValueError):
        make_offload_train_step(model, tcfg, max_blocks=3)


def test_trainer_offload_runs_and_resumes(tmp_path):
    """cfg.offload_optimizer through the real Trainer loop: steps advance,
    loss is finite, the checkpoint round-trips (OffloadState's chunk
    tuples restore through orbax), and the resumed run continues from the
    saved step."""
    from video_gpt_tpu.models.vae import VAEConfig
    from video_gpt_tpu.training.trainer import Trainer

    def make():
        cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                          mixed_precision="no", lr=1e-3,
                          lr_scheduler="constant", log_every=1,
                          ckpt_every=2, offload_optimizer=True,
                          offload_grad_splits=2,
                          results_dir=str(tmp_path))
        return Trainer(ModelConfig.tiny(attn_impl="reference",
                                        pos_embed_max_size=192),
                       cfg, "/root/reference/vids",
                       vae_cfg=VAEConfig.tiny(),
                       target_resolution=(48, 64))

    state = make().run(2)
    assert int(state.step) == 2
    assert isinstance(state.opt_state, OffloadState)
    assert int(state.opt_state.count) == 2
    assert np.isfinite(float(jax.tree.leaves(state.params)[0].sum()))

    # auto-resume picks up checkpoint-2 and walks one more step
    state2 = make().run(3)
    assert int(state2.step) == 3
    assert int(state2.opt_state.count) == 3


def test_trainer_offload_rejects_ema_and_lora(tmp_path):
    from video_gpt_tpu.models.vae import VAEConfig
    from video_gpt_tpu.training.trainer import Trainer

    def t(**kw):
        cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                          mixed_precision="no", offload_optimizer=True,
                          results_dir=str(tmp_path), log_every=1,
                          ckpt_every=1000, **kw)
        return Trainer(ModelConfig.tiny(attn_impl="reference",
                                        pos_embed_max_size=192),
                       cfg, "/root/reference/vids",
                       vae_cfg=VAEConfig.tiny(),
                       target_resolution=(48, 64))

    with pytest.raises(ValueError):
        t(use_ema=True).run(1)
    with pytest.raises(ValueError):
        t(use_lora=True).run(1)
