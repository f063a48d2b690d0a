"""Mesh-wired Trainer: data x seq mesh, ZeRO opt-state sharding, Ulysses SP.

The reference's equivalent wiring is Accelerate+DeepSpeed ZeRO-2 plus the
Ulysses replace_attention patch (train_x1_stage1:114-127,294-296,
train stage2 diff). Here the whole thing is one Trainer flag.
"""
import jax
import numpy as np
import pytest

from video_gpt_tpu.config import MeshConfig, ModelConfig, TrainConfig
from video_gpt_tpu.models.vae import VAEConfig
from video_gpt_tpu.parallel.mesh import DATA_AXIS
from video_gpt_tpu.training.trainer import Trainer

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("data,seq", [(2, 4)])
def test_trainer_mesh_steps_with_zero_sharding(tmp_path, data, seq):
    if len(jax.devices()) < data * seq:
        pytest.skip("needs 8 CPU devices")
    cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                      mixed_precision="no", lr=1e-3, lr_scheduler="constant",
                      log_every=1, ckpt_every=1000, use_ema=True,
                      results_dir=str(tmp_path))
    t = Trainer(ModelConfig.tiny(attn_impl="reference",
                                 pos_embed_max_size=192),
                cfg, "/root/reference/vids", vae_cfg=VAEConfig.tiny(),
                target_resolution=(48, 64),
                mesh_cfg=MeshConfig(data=data, seq=seq))
    # mesh flags flip the model to the Ulysses SP path
    assert t.model_cfg.sp_attention == "ulysses"
    assert t.model_cfg.seq_shard

    state = t.run(2)
    assert int(state.step) == 2

    # ZeRO: at least one optimizer-state leaf is actually sharded over data
    sharded = []
    for leaf in jax.tree.leaves(state.opt_state):
        if hasattr(leaf, "sharding") and hasattr(leaf.sharding, "spec"):
            sharded.append(DATA_AXIS in jax.tree.leaves(
                tuple(leaf.sharding.spec)))
    assert any(sharded), "no optimizer-state leaf sharded over 'data'"

    # loss finite end-to-end through the sharded step
    assert np.isfinite(float(
        jax.tree.leaves(state.params)[0].sum()))


def test_trainer_lora_on_mesh(tmp_path):
    """LoRA fine-tune under a (data, seq) mesh: the frozen base rides as a
    jit ARGUMENT (not a baked-in constant) and is itself mesh-placed —
    data-sharded here (ZeRO-3), replicated otherwise."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 CPU devices")
    cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                      use_lora=True, lora_rank=2, mixed_precision="no",
                      lr=1e-3, lr_scheduler="constant", log_every=1,
                      ckpt_every=1000, results_dir=str(tmp_path))
    t = Trainer(ModelConfig.tiny(attn_impl="reference",
                                 pos_embed_max_size=192),
                cfg, "/root/reference/vids", vae_cfg=VAEConfig.tiny(),
                target_resolution=(48, 64),
                mesh_cfg=MeshConfig(data=2, seq=4, zero_params=True))
    state = t.run(2)
    assert int(state.step) == 2
    assert "lora_a" in str(jax.tree_util.tree_structure(state.params))
    assert np.isfinite(float(jax.tree.leaves(state.params)[0].sum()))
    # the frozen base was placed with a data-axis sharding (ZeRO-3)
    base_leaves = [x for x in jax.tree.leaves(t._base_params)
                   if hasattr(x, "sharding") and hasattr(x.sharding, "spec")]
    assert any(DATA_AXIS in jax.tree.leaves(tuple(x.sharding.spec))
               for x in base_leaves), "base params not ZeRO-3 sharded"


def test_trainer_zero3_param_sharding(tmp_path):
    """MeshConfig.zero_params (ZeRO-3): params AND optimizer state sharded
    over 'data' at rest; the step still runs and stays finite (GSPMD
    inserts the per-use all-gathers)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 CPU devices")
    cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                      mixed_precision="no", lr=1e-3, lr_scheduler="constant",
                      log_every=1, ckpt_every=1000, use_ema=True,
                      results_dir=str(tmp_path))
    t = Trainer(ModelConfig.tiny(attn_impl="reference",
                                 pos_embed_max_size=192),
                cfg, "/root/reference/vids", vae_cfg=VAEConfig.tiny(),
                target_resolution=(48, 64),
                mesh_cfg=MeshConfig(data=2, seq=4, zero_params=True))
    state = t.run(2)
    assert int(state.step) == 2

    def frac_sharded(tree):
        leaves = [x for x in jax.tree.leaves(tree)
                  if hasattr(x, "sharding") and hasattr(x.sharding, "spec")]
        hits = [DATA_AXIS in jax.tree.leaves(tuple(x.sharding.spec))
                for x in leaves]
        return sum(hits), len(hits)

    np_, nt = frac_sharded(state.params)
    assert np_ > 0, "no param leaf sharded over 'data' under zero_params"
    ne, _ = frac_sharded(state.ema_params)
    assert ne > 0, "no EMA leaf sharded over 'data' under zero_params"
    loss_leaf = jax.tree.leaves(state.params)[0]
    assert np.isfinite(float(loss_leaf.sum()))


def test_trainer_tensor_parallel(tmp_path):
    """Trainer over a (data=2, tensor=2) mesh: the model flips to the
    TP-grouped layout, the Megatron placement actually shards the fused
    kernels over 'tensor', and the step stays finite."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 CPU devices")
    from video_gpt_tpu.parallel.mesh import TENSOR_AXIS
    cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                      mixed_precision="no", lr=1e-3, lr_scheduler="constant",
                      log_every=1, ckpt_every=1000,
                      results_dir=str(tmp_path))
    t = Trainer(ModelConfig.tiny(attn_impl="reference",
                                 pos_embed_max_size=192),
                cfg, "/root/reference/vids", vae_cfg=VAEConfig.tiny(),
                target_resolution=(48, 64),
                mesh_cfg=MeshConfig(data=2, tensor=2))
    assert t.model_cfg.tensor_parallel == 2
    state = t.run(2)
    assert int(state.step) == 2

    qkv = state.params["params"]["llm"]["layers"]["self_attn"]["qkv_proj"][
        "kernel"]
    assert tuple(qkv.sharding.spec)[-1] == TENSOR_AXIS
    mu_found = [
        leaf for leaf in jax.tree.leaves(state.opt_state)
        if hasattr(leaf, "sharding") and hasattr(leaf.sharding, "spec")
        and TENSOR_AXIS in jax.tree.leaves(tuple(leaf.sharding.spec))]
    assert mu_found, "no optimizer moment sharded over 'tensor'"
    assert np.isfinite(float(jax.tree.leaves(state.params)[0].sum()))


def test_trainer_cli_mesh_smoke(tmp_path):
    """`cli train --mesh_data 2 --mesh_seq 4` takes steps on the CPU mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 CPU devices")
    from video_gpt_tpu.cli import build_parser
    args = build_parser().parse_args([
        "train", "--video_dir_path", "/root/reference/vids",
        "--results_dir", str(tmp_path), "--max_steps", "1",
        "--frame_num", "4", "--mesh_data", "2", "--mesh_seq", "4",
        "--mixed_precision", "no", "--tiny_model", "--log_every", "1",
        "--ckpt_every", "1000", "--target_resolution", "48", "64",
        "--report_to", "none"])
    args.func(args)
