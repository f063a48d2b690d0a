"""LoRA adapters: identity at init, targeted placement, frozen-base training."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_gpt_tpu.config import ModelConfig, TrainConfig
from video_gpt_tpu.layout import RowSpec, build_layout
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.training.loss import LossInputs
from video_gpt_tpu.training.lora import apply_lora, init_lora, merge_lora
from video_gpt_tpu.training.train_state import (TrainState,
                                                make_lora_train_step,
                                                make_optimizer)

pytestmark = pytest.mark.slow

CFG = ModelConfig.tiny(attn_impl="reference")


def _setup():
    layout = build_layout([RowSpec((1, 2, 1), "training")], 4)
    batch = Batch.from_layout(layout)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(4, 4, 4, 4)).astype(np.float32))
    clean = jnp.asarray(rng.normal(size=(3, 4, 4, 4)).astype(np.float32))
    model = VideoGPT(CFG, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), batch, x1, jnp.zeros((4,)),
                        clean)
    inputs = LossInputs(batch=batch, x1=x1, clean_latents=clean,
                        noisy_frame_row=jnp.asarray(layout.noisy_frame_row),
                        noisy_frame_block=jnp.asarray(
                            layout.noisy_frame_block))
    return model, params, inputs, layout


def test_lora_identity_at_init_and_targets():
    model, params, inputs, layout = _setup()
    lora = init_lora(params["params"], rank=4, rng=jax.random.PRNGKey(1))
    # adapters exist exactly on qkv_proj/o_proj (stacked over layers)
    attn = lora["llm"]["layers"]["self_attn"]
    assert set(attn.keys()) == {"qkv_proj", "o_proj"}
    assert attn["qkv_proj"]["lora_a"].shape[0] == CFG.num_layers
    assert "mlp" not in lora["llm"]["layers"]
    # B=0 -> merged == base
    merged = merge_lora(params["params"], lora)
    base_out = model.apply(params, inputs.batch, inputs.x1,
                           jnp.full((4,), 0.3), inputs.clean_latents)
    lora_out = model.apply({"params": merged}, inputs.batch, inputs.x1,
                           jnp.full((4,), 0.3), inputs.clean_latents)
    np.testing.assert_allclose(np.asarray(lora_out), np.asarray(base_out),
                               atol=1e-6)


def test_lora_graft_matches_merge():
    """In-model adapters (rank>0 model + graft_lora) == merged kernels."""
    from dataclasses import replace

    from video_gpt_tpu.training.lora import graft_lora
    model, params, inputs, layout = _setup()
    lora = init_lora(params["params"], rank=4, rng=jax.random.PRNGKey(1))
    # make the adapters act (B is zero-init; randomise it)
    lora = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                               x.shape, x.dtype), lora)
    t = jnp.full((4,), 0.3)
    merged_out = model.apply(
        {"params": merge_lora(params["params"], lora)}, inputs.batch,
        inputs.x1, t, inputs.clean_latents)
    rank_model = VideoGPT(replace(CFG, lora_rank=4), dtype=jnp.float32)
    graft_out = rank_model.apply(
        {"params": graft_lora(params["params"], lora)}, inputs.batch,
        inputs.x1, t, inputs.clean_latents)
    np.testing.assert_allclose(np.asarray(graft_out),
                               np.asarray(merged_out), atol=2e-5)


def test_lora_training_updates_only_adapters():
    from dataclasses import replace
    model, params, inputs, layout = _setup()
    # a fresh model has a zero-initialised adaLN head (LVM/model.py:240-244),
    # which blocks gradients to the trunk; emulate a pretrained checkpoint
    fl = params["params"]["final_layer"]
    fl["linear"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(9), fl["linear"]["kernel"].shape)
    fl["adaLN_modulation"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(10), fl["adaLN_modulation"]["kernel"].shape)
    lora = init_lora(params["params"], rank=4, rng=jax.random.PRNGKey(1))
    cfg = TrainConfig(lr=1e-3, lr_scheduler="constant")
    rank_model = VideoGPT(replace(CFG, lora_rank=4), dtype=jnp.float32)
    step = jax.jit(make_lora_train_step(rank_model, cfg, max_blocks=3))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=lora,
                       opt_state=make_optimizer(cfg).init(lora))
    losses = []
    for _ in range(6):
        state, m = step(state, params, jax.random.PRNGKey(7), inputs)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # adapters moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         lora, state.params)
    assert max(jax.tree.leaves(moved)) > 0
