"""OmniGen-ancestor training path: json dataset, condition dropout,
velocity-target train step (OmniGen/train_helper/data.py:19-110,
OmniGen/train_helper/loss.py:40-45)."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import ModelConfig, TrainConfig
from video_gpt_tpu.data.image_text import (CFG_PROMPT, ImageTextDataset,
                                           collate_image_gen,
                                           resize_center_crop)
from video_gpt_tpu.image_gen import ImageGenProcessor
from video_gpt_tpu.models.vae import VAEConfig

pytestmark = pytest.mark.slow


class StubTokenizer:
    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        return self._Out([1] + [ord(c) % 97 + 3 for c in text][:64])


@pytest.fixture()
def json_dataset(tmp_path):
    from PIL import Image
    root = tmp_path / "imgs"
    root.mkdir()
    for name, color in (("a.png", 30), ("b.png", 120), ("out1.png", 200),
                        ("out2.png", 90)):
        Image.new("RGB", (40, 56), (color, color, color)).save(root / name)
    records = [
        {"instruction": "make it shiny <|image_1|> please",
         "input_images": ["a.png"], "output_image": "out1.png"},
        {"instruction": "just draw a cat",
         "input_images": None, "output_image": "out2.png"},
    ]
    jf = tmp_path / "data.jsonl"
    with open(jf, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return str(jf), str(root)


def test_resize_center_crop_exact_shape():
    from PIL import Image
    img = Image.new("RGB", (100, 30))
    out = resize_center_crop(img, (32, 48))
    assert out.shape == (32, 48, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_dataset_and_deterministic_dropout(json_dataset):
    jf, root = json_dataset
    proc = ImageGenProcessor(StubTokenizer(), token_ids=ModelConfig.tiny()
                             .token_ids)
    ds = ImageTextDataset(jf, root, proc, output_size=(32, 32),
                          input_size=(32, 32),
                          condition_dropout_prob=0.5, seed=7)
    assert len(ds) == 2
    s0a, s0b = ds.sample(0), ds.sample(0)
    # dropout is a pure function of (seed, index): identical across calls
    assert s0a.row.input_ids == s0b.row.input_ids
    assert len(s0a.input_pixels) == len(s0b.input_pixels)
    # with dropout prob 1.0 the conditions vanish and the prompt is <cfg>
    ds_drop = ImageTextDataset(jf, root, proc, output_size=(32, 32),
                               input_size=(32, 32),
                               condition_dropout_prob=1.0, seed=7)
    s = ds_drop.sample(0)
    assert s.input_pixels == []
    assert s.row.image_regions == []
    tok_cfg = StubTokenizer()(proc.add_prefix_instruction(CFG_PROMPT))
    assert s.row.input_ids == tok_cfg.input_ids[1:]
    # output image always present, fixed shape
    assert s.output_pixels.shape == (32, 32, 3)


def test_image_gen_train_step_runs_and_learns(json_dataset, tmp_path):
    jf, root = json_dataset
    from video_gpt_tpu.training.image_trainer import ImageGenTrainer
    mcfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=8)
    tcfg = TrainConfig(mixed_precision="no", gradient_checkpointing=False,
                       batch_size_per_device=2, log_every=1, ckpt_every=100,
                       lr=1e-3, lr_warmup_steps=1, auto_resume=False,
                       results_dir=str(tmp_path / "results"))
    trainer = ImageGenTrainer(
        mcfg, tcfg, jf, root, StubTokenizer(),
        output_size=(32, 32), input_size=(32, 32),
        condition_dropout_prob=0.5, max_input_images=1, pad_to=192,
        vae_cfg=VAEConfig.tiny(), seed=3)
    state = trainer.run(max_steps=3)
    assert int(state.step) == 3
    assert all(np.isfinite(np.asarray(jax.device_get(x))).all()
               for x in jax.tree.leaves(state.params))


def test_image_gen_trainer_mesh(json_dataset, tmp_path):
    """Image-gen training over a (2, 2) mesh: ZeRO opt-state over 'data',
    batch rows sharded, Ulysses over 'seq' (reference: accelerate/FSDP)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs fake CPU devices")
    jf, root = json_dataset
    from video_gpt_tpu.config import MeshConfig
    from video_gpt_tpu.parallel.mesh import DATA_AXIS
    from video_gpt_tpu.training.image_trainer import ImageGenTrainer
    mcfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=8)
    tcfg = TrainConfig(mixed_precision="no", gradient_checkpointing=False,
                       batch_size_per_device=1, log_every=1, ckpt_every=100,
                       lr=1e-3, lr_warmup_steps=1, auto_resume=False,
                       results_dir=str(tmp_path / "results_mesh"))
    trainer = ImageGenTrainer(
        mcfg, tcfg, jf, root, StubTokenizer(),
        output_size=(32, 32), input_size=(32, 32),
        condition_dropout_prob=0.5, max_input_images=1, pad_to=192,
        vae_cfg=VAEConfig.tiny(), mesh_cfg=MeshConfig(data=2, seq=2),
        seed=3)
    assert trainer.model_cfg.sp_attention == "ulysses"
    state = trainer.run(max_steps=2)
    assert int(state.step) == 2
    sharded = []
    for leaf in jax.tree.leaves(state.opt_state):
        if hasattr(leaf, "sharding") and hasattr(leaf.sharding, "spec"):
            sharded.append(DATA_AXIS in jax.tree.leaves(
                tuple(leaf.sharding.spec)))
    assert any(sharded), "no optimizer-state leaf sharded over 'data'"


def test_image_gen_trainer_tensor_parallel(json_dataset, tmp_path):
    """Image-gen training over a (data=2, tensor=2) mesh: the model flips
    to the TP-grouped layout and the fused kernels shard over 'tensor'."""
    if len(jax.devices()) < 4:
        pytest.skip("needs fake CPU devices")
    jf, root = json_dataset
    from video_gpt_tpu.config import MeshConfig
    from video_gpt_tpu.parallel.mesh import TENSOR_AXIS
    from video_gpt_tpu.training.image_trainer import ImageGenTrainer
    mcfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=8)
    tcfg = TrainConfig(mixed_precision="no", gradient_checkpointing=False,
                       batch_size_per_device=1, log_every=1, ckpt_every=100,
                       lr=1e-3, lr_warmup_steps=1, auto_resume=False,
                       results_dir=str(tmp_path / "results_tp"))
    trainer = ImageGenTrainer(
        mcfg, tcfg, jf, root, StubTokenizer(),
        output_size=(32, 32), input_size=(32, 32),
        condition_dropout_prob=0.5, max_input_images=1, pad_to=192,
        vae_cfg=VAEConfig.tiny(), mesh_cfg=MeshConfig(data=2, tensor=2),
        seed=3)
    assert trainer.model_cfg.tensor_parallel == 2
    state = trainer.run(max_steps=2)
    assert int(state.step) == 2
    qkv = state.params["params"]["llm"]["layers"]["self_attn"]["qkv_proj"][
        "kernel"]
    assert tuple(qkv.sharding.spec)[-1] == TENSOR_AXIS
    assert np.isfinite(float(jax.tree.leaves(state.params)[0].sum()))


def test_image_gen_trainer_offload(json_dataset, tmp_path):
    """cfg.offload_optimizer through ImageGenTrainer (same contract as the
    video Trainer): steps advance, finite params, OffloadState count."""
    jf, root = json_dataset
    from video_gpt_tpu.training.image_trainer import ImageGenTrainer
    from video_gpt_tpu.training.offload import OffloadState
    mcfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=8)
    tcfg = TrainConfig(mixed_precision="no", gradient_checkpointing=False,
                       batch_size_per_device=2, log_every=1, ckpt_every=100,
                       lr=1e-3, lr_warmup_steps=1, auto_resume=False,
                       offload_optimizer=True, offload_grad_splits=2,
                       results_dir=str(tmp_path / "results_off"))
    trainer = ImageGenTrainer(
        mcfg, tcfg, jf, root, StubTokenizer(),
        output_size=(32, 32), input_size=(32, 32),
        condition_dropout_prob=0.5, max_input_images=1, pad_to=192,
        vae_cfg=VAEConfig.tiny(), seed=3)
    state = trainer.run(max_steps=2)
    assert int(state.step) == 2
    assert isinstance(state.opt_state, OffloadState)
    assert int(state.opt_state.count) == 2
    assert all(np.isfinite(np.asarray(jax.device_get(x))).all()
               for x in jax.tree.leaves(state.params))
