"""Utility subsystems: export/import round-trip, parity probes, timers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import ModelConfig
from video_gpt_tpu.layout import RowSpec, build_layout
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.utils.parity import assert_replicated, max_tree_diff
from video_gpt_tpu.utils.torch_export import videogpt_params_to_torch
from video_gpt_tpu.utils.torch_import import videogpt_params_from_torch

CFG = ModelConfig.tiny(attn_impl="reference")


@pytest.mark.slow
def test_export_import_roundtrip():
    layout = build_layout([RowSpec((1, 1), "training")], 4)
    model = VideoGPT(CFG, dtype=jnp.float32)
    x = jnp.zeros((2, 4, 4, 4))
    params = model.init(jax.random.PRNGKey(0), Batch.from_layout(layout), x,
                        jnp.zeros((2,)), jnp.zeros((1, 4, 4, 4)))
    sd = videogpt_params_to_torch(params, CFG)
    back = {"params": videogpt_params_from_torch(sd, CFG)}
    assert max_tree_diff(params, back) == 0.0
    # reference-format names present
    assert "llm.layers.1.self_attn.qkv_proj.weight" in sd
    assert sd["x_embedder.proj.weight"].shape == (64, 4, 2, 2)


def test_parity_probes():
    a = {"x": jnp.ones((4, 4)), "y": jnp.zeros((2,))}
    b = {"x": jnp.ones((4, 4)) * 1.5, "y": jnp.zeros((2,))}
    assert abs(max_tree_diff(a, b) - 0.5) < 1e-6
    assert_replicated(a)  # single-shard arrays trivially replicated


def test_phase_timer():
    from video_gpt_tpu.utils.logging import PhaseTimer
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2 and "a:" in t.summary()


@pytest.mark.slow
def test_orbax_direct_inference_restore(tmp_path):
    """``generate --checkpoint_dir``: a training run feeds inference without
    the safetensors round-trip, including the EMA weights."""
    from video_gpt_tpu.cli import _restore_train_params
    from video_gpt_tpu.config import TrainConfig
    from video_gpt_tpu.training.train_state import init_train_state
    from video_gpt_tpu.utils import checkpoint as ckpt

    cfg = ModelConfig.tiny(attn_impl="reference")
    model = VideoGPT(cfg, dtype=jnp.float32, train_init=True)
    layout = build_layout([RowSpec((1, 1), "training")], 4)
    params = model.init(jax.random.PRNGKey(5), Batch.from_layout(layout),
                        jnp.zeros((2, 4, 4, 4)), jnp.zeros((2,)),
                        jnp.zeros((1, 4, 4, 4)))
    state = init_train_state(model, params, TrainConfig(use_ema=True))
    # make EMA distinguishable from the live params
    state = state._replace(ema_params=jax.tree.map(lambda x: x + 1.0,
                                                   state.ema_params))
    ckpt.save_checkpoint(str(tmp_path / "ckpts"), 3, state)

    tree, step = _restore_train_params(str(tmp_path / "ckpts"), cfg,
                                       ema=False)
    assert step == 3
    assert max_tree_diff(params, tree) == 0.0
    ema_tree, _ = _restore_train_params(str(tmp_path / "ckpts"), cfg,
                                        ema=True)
    assert abs(max_tree_diff(params, ema_tree) - 1.0) < 1e-6


@pytest.mark.slow
def test_cli_train_then_generate_from_checkpoint(tmp_path):
    """End-to-end: `cli train` (orbax checkpoint) -> `cli generate
    --checkpoint_dir` without any export step."""
    import os

    from video_gpt_tpu.cli import build_parser

    results = tmp_path / "run"
    args = build_parser().parse_args([
        "train", "--video_dir_path", "/root/reference/vids",
        "--results_dir", str(results), "--max_steps", "2",
        "--frame_num", "2", "--ckpt_every", "2", "--log_every", "1",
        "--mixed_precision", "no", "--tiny_model",
        "--target_resolution", "48", "64", "--report_to", "none"])
    args.func(args)
    ckpt_dir = results / "checkpoints"
    assert (ckpt_dir / "2").exists()

    out_dir = tmp_path / "frames"
    args = build_parser().parse_args([
        "generate", "--video_path", "/root/reference/vids/plane.mp4",
        "--checkpoint_dir", str(ckpt_dir), "--save_dir", str(out_dir),
        "--clean_image_num", "2", "--gen_nums", "1",
        "--num_inference_steps", "2", "--max_input_image_size", "48",
        "--tiny_model", "--dtype", "fp32", "--seed", "5"])
    args.func(args)
    assert any(f.endswith(".png") for f in os.listdir(out_dir))


@pytest.mark.slow
def test_cli_stage_chaining_warm_start(tmp_path):
    """Stage curriculum handoff: `cli train --init_checkpoint_dir` warm-
    starts stage N from stage N-1's orbax checkpoint (params only), the
    path configs/pretrain_stage{2,3,4}.sh use (reference:
    train_x1_stage1_noiseinput.py:316-332 loads prior-stage weights)."""
    from video_gpt_tpu.cli import _restore_train_params, build_parser

    stage1 = tmp_path / "stage1"
    args = build_parser().parse_args([
        "train", "--stage", "1", "--video_dir_path", "/root/reference/vids",
        "--results_dir", str(stage1), "--max_steps", "2",
        "--frame_num", "2", "--ckpt_every", "2", "--log_every", "1",
        "--mixed_precision", "no", "--tiny_model",
        "--target_resolution", "48", "64", "--report_to", "none"])
    args.func(args)
    ckpt1 = stage1 / "checkpoints"
    assert (ckpt1 / "2").exists()
    stage1_params, _ = _restore_train_params(
        str(ckpt1), ModelConfig.tiny(pos_embed_max_size=192))

    # capture what cmd_train hands the Trainer, then run the real thing
    import video_gpt_tpu.training.trainer as trainer_mod
    captured = {}
    real_trainer = trainer_mod.Trainer

    class CapturingTrainer(real_trainer):
        def __init__(self, *a, **kw):
            # snapshot to host: the live tree is later donated by the step
            captured["init_params"] = jax.tree.map(
                np.asarray, kw.get("init_params"))
            super().__init__(*a, **kw)

    stage2 = tmp_path / "stage2"
    args = build_parser().parse_args([
        "train", "--stage", "2", "--video_dir_path", "/root/reference/vids",
        "--results_dir", str(stage2), "--max_steps", "1",
        "--frame_num", "2", "--ckpt_every", "1", "--log_every", "1",
        "--init_checkpoint_dir", str(ckpt1),
        "--mixed_precision", "no", "--tiny_model",
        "--target_resolution", "48", "64", "--report_to", "none"])
    trainer_mod.Trainer = CapturingTrainer
    try:
        args.func(args)
    finally:
        trainer_mod.Trainer = real_trainer
    assert (stage2 / "checkpoints" / "1").exists()
    # the warm start fed stage-1's trained params, not a fresh init
    assert captured["init_params"] is not None
    assert max_tree_diff(captured["init_params"], stage1_params) == 0.0


@pytest.mark.slow
def test_checkpoint_export_roundtrip(tmp_path):
    """orbax checkpoint -> reference safetensors -> importer round trip."""
    from video_gpt_tpu.config import TrainConfig
    from video_gpt_tpu.layout import RowSpec, build_layout
    from video_gpt_tpu.training.train_state import init_train_state
    from video_gpt_tpu.utils import checkpoint as ckpt
    from video_gpt_tpu.utils.torch_export import save_safetensors

    cfg = ModelConfig.tiny(attn_impl="reference")
    model = VideoGPT(cfg, dtype=jnp.float32)
    layout = build_layout([RowSpec((1, 1), "training")], 4)
    params = model.init(jax.random.PRNGKey(5), Batch.from_layout(layout),
                        jnp.zeros((2, 4, 4, 4)), jnp.zeros((2,)),
                        jnp.zeros((1, 4, 4, 4)))
    state = init_train_state(model, params, TrainConfig())
    ckpt.save_checkpoint(str(tmp_path / "ckpts"), 7, state)
    restored, step = ckpt.restore_checkpoint(str(tmp_path / "ckpts"), state)
    assert step == 7
    out = tmp_path / "model.safetensors"
    save_safetensors(restored.params, cfg, str(out))
    from safetensors.numpy import load_file
    sd = load_file(str(out))
    back = {"params": videogpt_params_from_torch(sd, cfg)}
    assert max_tree_diff(params, back) == 0.0


@pytest.mark.slow
def test_cli_generate_video_dir_batches_same_bucket(tmp_path):
    """`generate --video_path_dir`: same-bucket videos ride one B=N
    program set (pipeline.generate_batch); odd buckets run alone. The
    sample dir has two 1280x720 videos and one 466x360, so this drives
    BOTH the batched and the single-row paths."""
    from video_gpt_tpu.cli import build_parser

    out_dir = tmp_path / "frames"
    args = build_parser().parse_args([
        "generate", "--video_path_dir", "/root/reference/vids",
        "--save_dir", str(out_dir),
        "--clean_image_num", "2", "--gen_nums", "1",
        "--num_inference_steps", "1", "--max_input_image_size", "48",
        "--tiny_model", "--dtype", "fp32", "--seed", "5"])
    args.func(args)
    import os
    names = sorted(os.listdir(out_dir))
    # 3 videos x (2 roundtripped conditions + 1 generated) = 9 frames,
    # prefixed by the videos' directory order
    assert sum(n.endswith(".png") for n in names) == 9
    assert {n.split("_")[0] for n in names} == {"0", "1", "2"}


@pytest.mark.slow
def test_cli_lora_train_then_merged_inference(tmp_path):
    """`train --use_lora` -> `generate --lora_checkpoint_dir`: the adapter
    tree restores from the LoRA run's orbax checkpoint and merges into the
    base weights at load (reference merge_lora, LVM/pipeline.py:97-101)."""
    import os
    from video_gpt_tpu.cli import build_parser

    results = tmp_path / "lora_run"
    args = build_parser().parse_args([
        "train", "--video_dir_path", "/root/reference/vids",
        "--results_dir", str(results), "--max_steps", "2",
        "--frame_num", "2", "--ckpt_every", "2", "--log_every", "1",
        "--mixed_precision", "no", "--tiny_model", "--use_lora",
        "--lora_rank", "2", "--target_resolution", "48", "64",
        "--report_to", "none"])
    args.func(args)
    ckpt_dir = results / "checkpoints"
    assert (ckpt_dir / "2").exists()

    # base weights: a plain (non-LoRA) checkpoint from a second tiny run
    base = tmp_path / "base_run"
    args = build_parser().parse_args([
        "train", "--video_dir_path", "/root/reference/vids",
        "--results_dir", str(base), "--max_steps", "1",
        "--frame_num", "2", "--ckpt_every", "1", "--log_every", "1",
        "--mixed_precision", "no", "--tiny_model",
        "--target_resolution", "48", "64", "--report_to", "none"])
    args.func(args)

    out_dir = tmp_path / "frames"
    args = build_parser().parse_args([
        "generate", "--video_path", "/root/reference/vids/plane.mp4",
        "--checkpoint_dir", str(base / "checkpoints"),
        "--lora_checkpoint_dir", str(ckpt_dir), "--lora_rank", "2",
        "--save_dir", str(out_dir),
        "--clean_image_num", "2", "--gen_nums", "1",
        "--num_inference_steps", "1", "--max_input_image_size", "48",
        "--tiny_model", "--dtype", "fp32", "--seed", "5"])
    args.func(args)
    assert any(f.endswith(".png") for f in os.listdir(out_dir))


def test_prefetcher_multiworker_order():
    """get() must return batches strictly in index order even when several
    worker threads race (later indices can reach the queue first) — the
    deterministic data order that resume relies on."""
    import time as _time

    from video_gpt_tpu.data.prefetch import Prefetcher

    def make(idx):
        _time.sleep(0.002 * ((idx * 7) % 5))  # jitter completion order
        return idx

    p = Prefetcher(make, depth=4, workers=4, start=3)
    got = [p.get() for _ in range(40)]
    p.close()
    assert got == list(range(3, 43))


def test_checkpoint_format_resolution(tmp_path):
    """load_reference_checkpoint covers the reference driver's four formats
    and ITS precedence order (inference driver:49-66): model.pt >
    model.safetensors > pytorch_model.bin file > pytorch_model.bin/ shard
    directory (merged)."""
    import torch
    from video_gpt_tpu.utils.torch_import import (load_reference_checkpoint,
                                                  resolve_checkpoint_path)

    d = tmp_path / "ckpt"
    d.mkdir()
    # shard DIRECTORY named pytorch_model.bin, like HF sharded saves
    shards = d / "pytorch_model.bin"
    shards.mkdir()
    torch.save({"a": torch.ones(2)}, shards / "pytorch_model-00001.bin")
    torch.save({"b": torch.full((3,), 2.0)}, shards / "pytorch_model-00002.bin")
    sd = load_reference_checkpoint(str(d))
    assert set(sd) == {"a", "b"} and sd["b"].dtype == np.float32
    np.testing.assert_array_equal(sd["a"], np.ones(2, np.float32))

    # safetensors takes precedence over the shard dir ...
    from safetensors.numpy import save_file
    save_file({"c": np.zeros(1, np.float32)}, str(d / "model.safetensors"))
    assert set(load_reference_checkpoint(str(d))) == {"c"}
    # ... and model.pt over both (and it implies prediction_type 'v',
    # which cli generate derives from the resolved basename)
    torch.save({"d": torch.zeros(1)}, d / "model.pt")
    assert set(load_reference_checkpoint(str(d))) == {"d"}
    import os
    assert os.path.basename(resolve_checkpoint_path(str(d))) == "model.pt"


def test_frontier_loader_separates_row_types(tmp_path):
    """utils/frontier.py: student-quality rows must never shadow plain
    teacher schedule rows (they are different quantities measured against
    different references), and r05 trained-weight rows overwrite r04."""
    import json

    from video_gpt_tpu.utils.frontier import (load_schedule_drift,
                                              load_student_quality)
    r04 = [  # randomised-head sweep: no schedule/weights/reference fields
        {"num_steps": 5, "uncond_refresh": 2, "time_shift": 1.0,
         "cfg_interval": None, "rel_final_latent_mse": 0.002},
        {"num_steps": 6, "uncond_refresh": 2, "time_shift": 1.0,
         "cfg_interval": None, "rel_final_latent_mse": 0.003},
    ]
    r05 = [
        {"weights": "trained", "schedule": "steps=5,k=2", "num_steps": 5,
         "time_shift": 1.0, "cfg_interval": None, "uncond_refresh": 2,
         "reference": "50-step always-CFG", "rel_final_latent_mse": 0.15},
        {"weights": "trained+distilled", "schedule": "student5@5,k=2",
         "num_steps": 5, "uncond_refresh": 2,
         "reference": "50-step always-CFG (teacher)",
         "rel_final_latent_mse": 0.11},
        {"weights": "trained+guided-distilled", "schedule": "gstudent5@5",
         "num_steps": 5, "uncond_refresh": 0,
         "reference": "50-step always-CFG (teacher)",
         "rel_final_latent_mse": 0.12},
        {"weights": "trained", "schedule": "teacher_noCFG@10",
         "num_steps": 10, "uncond_refresh": 0,
         "reference": "50-step always-CFG (teacher)",
         "rel_final_latent_mse": 0.5},
    ]
    with open(tmp_path / "drift_frontier_r04.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in r04)
    with open(tmp_path / "drift_frontier_r05.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in r05)

    drift = load_schedule_drift(str(tmp_path))
    # r05 teacher row overwrites r04; the student5@5,k=2 row (same
    # num_steps/uncond_refresh) must NOT shadow it
    assert drift[(5, 2, 1.0, None)]["rel_final_latent_mse"] == 0.15
    assert drift[(5, 2, 1.0, None)]["reference"] == "50-step always-CFG"
    # r04-only rows survive with the sweep's implied reference
    assert drift[(6, 2, 1.0, None)]["rel_final_latent_mse"] == 0.003
    assert drift[(6, 2, 1.0, None)]["reference"] == "10-step always-CFG"
    # diagnostics are not schedule rows
    assert (10, 0, 1.0, None) not in drift

    students = load_student_quality(str(tmp_path))
    assert students == {"student5@5,k=2": 0.11, "gstudent5@5": 0.12}
