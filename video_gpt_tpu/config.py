"""Typed configuration for the whole framework.

Replaces the reference's per-driver argparse sprawl + DeepSpeed JSON
(LVM/train/*.py:466-601, LVM/acceleration/config/*.json) with dataclasses.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .tokens import DEFAULT_TOKEN_IDS, TokenIds


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """DiT-over-Phi3 next-clip diffusion model.

    Reference-scale defaults: Phi-3-mini class backbone, hidden 3072
    (LVM/processor.py:427), patch 2, 4 latent channels (LVM/model.py:161-192).
    """

    # backbone (Phi-3 style decoder)
    hidden_size: int = 3072
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 8192
    vocab_size: int = 32064
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    # DiT wrapper
    patch_size: int = 2
    in_channels: int = 4
    pe_interpolation: float = 1.0
    pos_embed_max_size: int = 192
    freq_embed_size: int = 256
    # execution
    attn_impl: str = "auto"  # 'auto' | 'reference' | 'pallas'
    remat: bool = False      # jax.checkpoint each decoder layer
    seq_shard: bool = False  # constrain activations to P(data, seq, None)
                             # under a mesh (sequence parallelism)
    sp_attention: str = "none"  # 'none' (GSPMD decides) | 'ulysses'
                                # (explicit shard_map all-to-all attention
                                # over the mesh's seq axis; no-op off-mesh)
                                # | 'ring' (blockwise K/V rotation via
                                # ppermute — SP degree not capped by the
                                # head count; parallel/ring.py)
    scan_unroll: int = 1     # unroll factor for the layer scan (compile time
                             # vs scheduling freedom)
    # Megatron-style tensor parallelism over the mesh's 'tensor' axis.
    # STATIC and layout-affecting: the fused qkv_proj / gate_up_proj
    # feature columns are stored TP-GROUPED (shard-major [q_i|k_i|v_i] /
    # [gate_i|up_i] per tensor shard i) so the column-parallel sharding is
    # block-aligned — zero resharding inside the layer. Checkpoints in the
    # standard fused order convert with parallel.tensor.tp_regroup_params.
    # 1 = standard layout (the two layouts coincide).
    tensor_parallel: int = 1
    # in-model LoRA (qkv_proj/o_proj): rank 0 = off. Adapters act INSIDE the
    # layer (y += (alpha/r)*(x@A)@B) so a frozen-base fine-tune only ever
    # materialises adapter gradients — merging outside the model would make
    # the scan backward accumulate stacked f32 kernel cotangents (~4.5G at
    # 3.8B scale) before contracting them to dA/dB
    lora_rank: int = 0
    lora_alpha: float = 8.0
    # precompute the attention bias once per clip (shared by all layers and
    # denoise steps) when B*Lq*Lk is at most this many elements (~512 MB
    # bf16); larger sequences use the O(L) in-kernel mask path
    precompute_bias_limit: int = 256_000_000
    token_ids: TokenIds = DEFAULT_TOKEN_IDS

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls, **kw) -> "ModelConfig":
        """Small config for tests."""
        d = dict(hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=4,
                 intermediate_size=128, vocab_size=32064,
                 pos_embed_max_size=16)
        d.update(kw)
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Flow-matching Euler sampler (LVM/scheduler.py:119-130)."""

    num_steps: int = 50
    time_shifting_factor: float = 1.0
    prediction_type: str = "x1"  # 'x1' | 'v'
    begin_time: Optional[float] = None  # start the sigma grid late
                                        # (LVM/scheduler.py:124-127)
    # guidance interval (lo, hi): apply CFG only where sigma in [lo, hi);
    # outside it the UNCONDITIONAL evaluation is skipped entirely
    # (Kynkaenniemi et al. 2024, arXiv:2404.07724). None = guidance at
    # every step (reference semantics). Serving work-reduction knob: the
    # uncond row costs ~47% of each denoise step at flagship shapes.
    cfg_interval: Optional[Tuple[float, float]] = None
    # among the guided steps, evaluate the unconditional context only every
    # k-th step and REUSE the cached uncond prediction in between
    # (DeepCache/TeaCache-style feature reuse restricted to the uncond
    # branch; scheduler.step_kinds). 1 = evaluate at every guided step
    # (reference semantics). Drift measured by scripts/cfg_drift.py.
    uncond_refresh: int = 1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh: data × sequence × tensor × pipeline axes.

    ``zero_params``: ZeRO-3-style parameter sharding — params and EMA are
    sharded over ``data`` at rest (like the optimizer state) and XLA's SPMD
    partitioner inserts the per-use all-gathers, the GSPMD analogue of the
    reference's DeepSpeed stage-3 configs (stage3_offload_bf16_dp.json).

    ``tensor``: Megatron-style tensor parallelism — attention heads and MLP
    hidden features sharded over the axis, with the column/row-parallel
    kernels laid out block-aligned (ModelConfig.tensor_parallel).

    ``pipe``: GPipe pipeline parallelism — the layer stack's leading (scan)
    axis sharded into contiguous stages; microbatches flow stage-to-stage
    over ``ppermute`` (parallel/pipeline.py)."""

    data: int = 1
    seq: int = 1
    tensor: int = 1
    pipe: int = 1
    zero_params: bool = False

    @property
    def num_devices(self) -> int:
        return self.data * self.seq * self.tensor * self.pipe


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Stage-1..4 training recipes (LVM/script/train/pretrain_stage*_nv.sh)."""

    # data
    frame_num: int = 16
    frame_interval: int = 4
    flexible_interval: bool = False
    interval_bound: Optional[int] = None
    frame_block_scheme: str = "interleaved"  # 'interleaved' | 'frame_block'
    max_image_size: int = 320
    max_input_length_limit: int = 18000
    batch_size_per_device: int = 1
    # optimisation (pretrain_stage1_nv.sh:40-47)
    lr: float = 1e-4
    lr_scheduler: str = "constant_with_warmup"
    lr_warmup_steps: int = 1000
    adam_beta1: float = 0.9
    adam_beta2: float = 0.95
    adam_weight_decay: float = 0.1
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    mixed_precision: str = "bf16"  # 'bf16' | 'no'
    gradient_checkpointing: bool = True
    sp_attention: str = "ulysses"  # mechanism when mesh seq > 1:
                                   # 'ulysses' | 'ring' (see ModelConfig)
    # GPipe microbatches per step when mesh pipe > 1 (0 = the pipe degree;
    # more microbatches shrink the bubble: pp-1 of nm+pp-1 ticks are idle
    # per stage). Global batch rows must be divisible by it.
    pp_microbatches: int = 0
    # loss (LVM/train_helper/loss.py:116-119; train_x1_stage1:594)
    input_noise: float = 0.9
    cls_weight: Optional[float] = None
    input_output_return: bool = False
    # EMA / LoRA
    use_ema: bool = False
    ema_decay: float = 0.9999
    use_lora: bool = False
    lora_rank: int = 8
    # progressive step-distillation (training/distill.py): train the model
    # to serve at `distill_student_steps` Euler steps by regressing onto a
    # frozen teacher's `distill_substeps`-step rollouts (Salimans & Ho 2022,
    # arXiv:2202.00512 adapted to x1-prediction). The teacher is the
    # --init_checkpoint_dir / --model_ckpt weights; the student starts from
    # them. `distill_time_shift` must match the serving
    # SchedulerConfig.time_shifting_factor. Conditioning frames are fed
    # clean (distill_input_noise=1) to match the serving regime
    # (inference_nv.sh:35), unlike pretraining's U[0.9,1] robustness noise.
    distill: bool = False
    distill_student_steps: int = 5
    distill_substeps: int = 2
    distill_time_shift: float = 1.0
    distill_input_noise: float = 1.0
    # Continue-from-teacher training needs a far lower peak LR than
    # pretraining: the student starts ~converged (loss ~= the teacher's own
    # discretization gap), so Adam's scale-invariant first step at the
    # pretraining LR (1e-4..1e-3) blasts it 10-100x off the teacher before
    # slowly recovering (measured: lr=1e-3 spikes a tiny model 80x on step 1
    # and never halves the gap in 8 steps; lr=1e-4 halves it by step 4).
    # `distill_lr` overrides `lr` inside the distillation optimizer only;
    # None inherits `lr` (for users who retuned it deliberately). Warmup
    # still applies via lr_scheduler/lr_warmup_steps.
    distill_lr: Optional[float] = 1e-4
    # Per-frame loss weighting across grid points: the Euler-inversion
    # target multiplies the teacher's landed endpoint by (1-s)/(s_next-s),
    # which amplifies early-grid targets ~S_x relative to late ones, so plain
    # MSE ("uniform", the Salimans & Ho-style default here — NOTE this
    # deviates from the paper's truncated-SNR weighting) conditions grid
    # points unevenly. "endpoint" weights each frame by
    # ((s_next-s)/(1-s))^2, making the regression exactly the MSE between
    # where the student's one Euler step LANDS and where the teacher's
    # rollout landed — equal footing for every grid point.
    distill_loss_weight: str = "uniform"
    # GUIDANCE distillation (Meng et al. 2023, arXiv:2210.03142, adapted to
    # x1-prediction flow matching): when set, the teacher target is the
    # classifier-free-guided prediction uncond + w*(cond - uncond) — the
    # serving sampler's exact combination (scheduler.cfg_mix) — with the
    # unconditional branch evaluated on the 'uncond' layout scheme
    # (layout.py), so the student bakes guidance in and serves with
    # use_cfg=False: ONE forward per step, no uncond row/KV program. Must
    # match the cfg_scale you would have served with (inference_nv.sh:34
    # serves the reference at 1.5). Composes with step distillation: a
    # guided 5-step student costs 5 NFE where separate-CFG 5-step costs
    # 8-10.
    distill_guidance: Optional[float] = None
    # host-offloaded AdamW (training/offload.py): f32 master/mu/nu in
    # pinned_host memory, update math as host compute — the single-chip
    # full-depth path, the TPU analogue of the reference's ZeRO-offload
    # (LVM/acceleration/config/stage3_offload_bf16_dp.json:10-19).
    # offload_grad_splits=2 halves the live grad-accumulator HBM for one
    # forward recompute (needed at 3.8B scale on a 16G chip).
    offload_optimizer: bool = False
    offload_grad_splits: int = 1
    # data loading (reference: DataLoader num_workers=4 / prefetch_factor,
    # train_x1_stage1:244-272 — here worker THREADS feeding the Prefetcher)
    num_workers: int = 1
    prefetch_depth: int = 2
    # run control
    epochs: int = 1400
    # total optimization steps of the run — the cosine decay horizon.
    # Trainer.run / ImageGenTrainer.run bind it from their max_steps
    # argument when unset; 'cosine' refuses to run without it (a horizon
    # invented from anything else silently mis-shapes the schedule).
    # Reference knob surface: train_x1_stage1_noiseinput.py:506-516.
    max_steps: Optional[int] = None
    log_every: int = 100
    ckpt_every: int = 20000
    auto_resume: bool = True
    results_dir: str = "results"
    seed: int = 0


def stage_config(stage: int, **overrides) -> TrainConfig:
    """The 4-stage curriculum (pretrain_stage{1..4}_nv.sh)."""
    base = {
        1: dict(frame_num=16, frame_interval=4,
                frame_block_scheme="interleaved"),
        2: dict(frame_num=48, frame_interval=4,
                frame_block_scheme="frame_block", ckpt_every=1000),
        3: dict(frame_num=48, frame_interval=4, flexible_interval=True,
                interval_bound=12, frame_block_scheme="frame_block",
                ckpt_every=1000),
        4: dict(frame_num=80, frame_interval=4, flexible_interval=True,
                interval_bound=12, frame_block_scheme="frame_block",
                max_input_length_limit=1_280_000, ckpt_every=1000),
    }[stage]
    base.update(overrides)
    return TrainConfig(**base)
