"""Training loop: dataset -> VAE encode -> flow-matching step -> checkpoints.

Replaces the three reference train drivers (LVM/train/train_x1_stage*.py)
with one loop parameterised by TrainConfig (the 4-stage curriculum is
config, not code — see config.stage_config). Differences by design:

- VAE encode + loss + backward + clip + AdamW + EMA run as ONE jitted
  program per step (the reference interleaves host-side loops,
  train_x1_stage1:351-408)
- auto-resume from the latest orbax checkpoint (reference:304-334)
- tensorboardX metrics + steps/sec, mirroring reference logging (:405-434)
- determinism is structural: one PRNG key per step; no cross-rank noise
  broadcasts (LVM/train_helper/loss.py:150-172 become unnecessary)
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MeshConfig, ModelConfig, TrainConfig
from ..layout import tokens_per_frame
from ..models.vae import AutoencoderKL, VAEConfig
from ..models.video_gpt import VideoGPT
from ..data.video import VideoClipDataset
from ..utils import checkpoint as ckpt
from .data import TrainBatch, collate
from .train_state import TrainState, init_train_state, make_train_step


class Trainer:
    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        video_source: str,
        vae_cfg: VAEConfig = VAEConfig(),
        vae_params=None,
        init_params=None,
        target_resolution=(176, 320),
        mesh_cfg: Optional[MeshConfig] = None,
        seed: int = 0,
    ):
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        dtype = jnp.bfloat16 if train_cfg.mixed_precision == "bf16" \
            else jnp.float32
        # mesh: data (batch rows + ZeRO opt-state) x seq (Ulysses attention)
        # — the TPU equivalent of the reference's Accelerate/DeepSpeed + SP
        # wiring (train_x1_stage1:114-127, parallel_states.py:27-53)
        self.mesh = None
        self._sp = 1
        self._dp = 1
        self._tp = 1
        self._pp = 1
        self._zero_params = False
        if mesh_cfg is not None and mesh_cfg.num_devices > 1:
            from ..parallel.mesh import make_mesh
            self.mesh = make_mesh(mesh_cfg)
            self._sp = mesh_cfg.seq
            self._dp = mesh_cfg.data
            self._tp = mesh_cfg.tensor
            self._pp = mesh_cfg.pipe
            self._zero_params = mesh_cfg.zero_params
        overrides = {}
        if self._sp > 1:
            overrides["seq_shard"] = True
            overrides["sp_attention"] = train_cfg.sp_attention
        if self._tp > 1 and model_cfg.tensor_parallel != self._tp:
            # Megatron TP: static (layout-affecting) — the model must be
            # built for the mesh's tensor degree (parallel/tensor.py)
            overrides["tensor_parallel"] = self._tp
        if self._pp > 1:
            if self._sp > 1 or self._tp > 1:
                raise ValueError(
                    "pipeline parallelism composes with data parallelism "
                    "only (the stage body is local math); use tp/sp "
                    "without pp for those regimes")
            if train_cfg.use_lora:
                raise ValueError("LoRA fine-tuning does not route through "
                                 "the pipeline trunk; use dp/ZeRO for LoRA")
            if model_cfg.num_layers % self._pp:
                raise ValueError(
                    f"num_layers={model_cfg.num_layers} not divisible by "
                    f"the pipe axis {self._pp}")
        if train_cfg.gradient_checkpointing and not model_cfg.remat:
            overrides["remat"] = True
        if train_cfg.use_lora and not model_cfg.lora_rank:
            # in-model adapters (phi3.LoraDense) — see make_lora_train_step
            overrides["lora_rank"] = train_cfg.lora_rank
        est_l = 2 * train_cfg.frame_num * (
            tokens_per_frame(*target_resolution) + 2)
        # 'auto' trains through the custom-VJP resident flash kernels up to
        # their ~8k-key VMEM cap and through the streaming Pallas fwd+bwd
        # pair beyond it — no dense-bias cliff at stage-2/3/4 lengths
        # enforce the sequence budget (reference rejects long samples,
        # LVM/train_helper/data.py:224-225; here shapes are static so the
        # check is static too)
        est_tokens = est_l
        if est_tokens > train_cfg.max_input_length_limit:
            raise ValueError(
                f"sequence of ~{est_tokens} tokens exceeds "
                f"max_input_length_limit={train_cfg.max_input_length_limit}; "
                "lower frame_num/resolution or raise the limit")
        if overrides:
            model_cfg = ModelConfig(**{**model_cfg.__dict__, **overrides})
            self.model_cfg = model_cfg
        self.model = VideoGPT(model_cfg, dtype=dtype, train_init=True,
                              input_head=train_cfg.input_output_return)
        self.vae = AutoencoderKL(vae_cfg, dtype=dtype)
        self.dataset = VideoClipDataset(
            video_source,
            frame_num=train_cfg.frame_num,
            frame_interval=train_cfg.frame_interval,
            flexible_interval=train_cfg.flexible_interval,
            interval_bound=train_cfg.interval_bound,
            target_resolution=target_resolution,
            scheme=train_cfg.frame_block_scheme,
            seed=seed,
            # per-host dataset sharding (reference: data.py:162-168 shards by
            # accelerator.process_index); a single-host mesh shares the list
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )
        self.target_resolution = target_resolution
        self.rng = jax.random.PRNGKey(seed)
        self._init_params = init_params
        # distillation sanity: the teacher is supposed to be warm-start
        # weights; remember whether any were actually provided
        self._warm_start = init_params is not None
        self._vae_params = vae_params
        self._jit_step = None

    # ---- setup -------------------------------------------------------------

    @property
    def _batch_rows(self) -> int:
        """Global batch rows = per-device rows x data-axis size."""
        return self.cfg.batch_size_per_device * self._dp

    def _example_batch(self) -> TrainBatch:
        sample = self.dataset.sample(0)
        n_img = tokens_per_frame(*self.target_resolution)
        return collate([sample] * self._batch_rows, n_img,
                       sp_multiple=self._sp,
                       uncond=self.cfg.distill_guidance is not None)

    def _place_state(self, state: TrainState) -> TrainState:
        """Optimizer state ZeRO-sharded over 'data'; params replicated, or
        also data-sharded under MeshConfig.zero_params (ZeRO-3)."""
        if self.mesh is None:
            return state
        from ..parallel.mesh import place_train_state
        return place_train_state(state, self.mesh,
                                 zero_params=self._zero_params,
                                 tp=self._tp > 1, pp=self._pp > 1)

    def _shard_batch(self, tb: TrainBatch) -> TrainBatch:
        """[B, L] token arrays over (data, seq); pixel rows over data."""
        if self.mesh is None:
            return tb
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS, SEQ_AXIS
        tok = NamedSharding(self.mesh, P(DATA_AXIS, SEQ_AXIS))
        row = NamedSharding(self.mesh, P(DATA_AXIS))
        repl = NamedSharding(self.mesh, P())
        b = self._batch_rows
        l = tb.inputs.batch.input_ids.shape[1]
        # guidance distillation rides a second (shorter, sp-aligned) token
        # layout — shard it over (data, seq) like the main one
        lens = {l}
        if tb.inputs.batch_uncond is not None:
            lens.add(tb.inputs.batch_uncond.input_ids.shape[1])

        def put(x):
            if not hasattr(x, "ndim"):
                return x
            if x.ndim == 2 and x.shape[0] == b and x.shape[1] in lens:
                return jax.device_put(x, tok)
            return jax.device_put(x, repl)

        inputs = jax.tree.map(put, tb.inputs)
        pixels = jax.device_put(
            tb.pixels, row if tb.pixels.shape[0] % self._dp == 0 else repl)
        return tb._replace(inputs=inputs, pixels=pixels)

    def _build(self, tb: TrainBatch):
        h, w = self.target_resolution
        f = self.vae.cfg.downsample_factor
        hl, wl = h // f, w // f
        c = self.model_cfg.in_channels
        if self._vae_params is None:
            self._vae_params = self.vae.init(
                jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)),
                jax.random.PRNGKey(2), True)
        if self._init_params is None:
            nn_ = int(tb.noisy_sel.shape[0])
            nc = int(tb.clean_sel.shape[0])
            z = jnp.zeros((nn_, hl, wl, c))
            cl = jnp.zeros((nc, hl, wl, c))
            self._init_params = self.model.init(
                jax.random.PRNGKey(3), tb.inputs.batch, z,
                jnp.zeros((nn_,)), cl)
        max_blocks = self.cfg.frame_num
        if self.cfg.offload_optimizer:
            if self.cfg.distill:
                raise ValueError("distillation holds teacher+student trees; "
                                 "it does not compose with the single-chip "
                                 "offload path — use ZeRO over a mesh")
            return self._build_offload(max_blocks)
        apply_fn = None
        if self._pp > 1:
            # GPipe trunk: the layer stack is staged over 'pipe' and
            # microbatches flow over ppermute (parallel/pipeline.py)
            import functools
            from ..parallel.pipeline import pp_apply
            nm = self.cfg.pp_microbatches or self._pp
            if self.cfg.batch_size_per_device % nm:
                # rows shard over 'data', so each data shard must hold
                # whole microbatches: per-device rows % microbatches
                raise ValueError(
                    f"batch_size_per_device="
                    f"{self.cfg.batch_size_per_device} not divisible "
                    f"by pp_microbatches={nm}")
            apply_fn = functools.partial(pp_apply, self.model,
                                         num_micro=nm)
        if not self.cfg.distill and self.cfg.distill_guidance is not None:
            raise ValueError("--distill_guidance is a distillation knob; "
                             "pass --distill with it")
        if self.cfg.distill:
            # progressive step-distillation (training/distill.py): the
            # frozen teacher is the warm-start weights and rides the
            # base-params argument slot; the student starts from a COPY
            # (the jitted step donates the state, so aliasing the teacher's
            # buffers into state.params would donate them away)
            if self.cfg.use_lora:
                raise ValueError("distillation trains the full student; "
                                 "it does not compose with --use_lora")
            if not self._warm_start:
                # distilling a randomly initialized teacher is almost
                # certainly user error (the CLI help promises the teacher is
                # the --model_ckpt/--init_checkpoint_dir weights); warn
                # loudly rather than raise so self-contained smoke/CI runs
                # on fresh weights stay possible
                print("WARNING: --distill with no --model_ckpt/"
                      "--init_checkpoint_dir — the frozen teacher is a "
                      "RANDOMLY INITIALIZED model. Distillation regresses "
                      "the student onto this teacher's rollouts; if you "
                      "meant to distill trained weights, pass them.",
                      flush=True)
            from .distill import make_distill_train_step
            copy = jax.jit(lambda x: x.copy())
            student = jax.tree.map(copy, self._init_params)
            state = init_train_state(self.model, student, self.cfg)
            d_step = make_distill_train_step(self.model, self.cfg,
                                             max_blocks, apply_fn=apply_fn)
            self._base_params = self._init_params
            if self.mesh is not None:
                from ..parallel.mesh import param_specs
                sh = param_specs(self._base_params, self.mesh,
                                 tp=self._tp > 1, pp=self._pp > 1,
                                 zero=self._zero_params)
                self._base_params = jax.device_put(self._base_params, sh)
            inner = (lambda state, base, r, inputs:
                     d_step(state, base, r, inputs))
        elif self.cfg.use_lora:
            # adapter-only fine-tuning: frozen base, LoRA tree in the state
            # (reference peft path, train_x1_stage1:204-223)
            from .lora import init_lora
            from .train_state import make_lora_train_step, make_optimizer
            lora = init_lora(self._init_params["params"], self.cfg.lora_rank,
                             jax.random.PRNGKey(4))
            state = TrainState(
                step=jnp.zeros((), jnp.int32), params=lora,
                opt_state=make_optimizer(self.cfg).init(lora),
                ema_params=(jax.tree.map(jnp.copy, lora)
                            if self.cfg.use_ema else None))
            lora_step = make_lora_train_step(self.model, self.cfg,
                                             max_blocks)
            # the frozen base rides as a jit ARGUMENT (a closure would bake
            # the ~7.6G base into the program as a constant at 3.8B scale)
            self._base_params = self._init_params
            if self.mesh is not None:
                # place on the mesh like the trainable params: tp/pp layout
                # applied, data-sharded at rest under ZeRO-3
                from ..parallel.mesh import param_specs
                sh = param_specs(self._base_params, self.mesh,
                                 tp=self._tp > 1, pp=self._pp > 1,
                                 zero=self._zero_params)
                self._base_params = jax.device_put(self._base_params, sh)
            inner = (lambda state, base, r, inputs:
                     lora_step(state, base, r, inputs))
        else:
            state = init_train_state(self.model, self._init_params, self.cfg)
            raw_step = make_train_step(self.model, self.cfg, max_blocks,
                                       apply_fn=apply_fn)
            self._base_params = None
            inner = lambda state, base, r, inputs: raw_step(state, r, inputs)
        vae = self.vae

        def full_step(state: TrainState, base_params, vae_params, rng,
                      tb: TrainBatch):
            r_enc, r_loss = jax.random.split(rng)
            latents = vae.apply(vae_params, tb.pixels, r_enc,
                                method=AutoencoderKL.encode)
            latents = jax.lax.stop_gradient(latents)
            inputs = tb.inputs._replace(
                x1=jnp.take(latents, tb.noisy_sel, axis=0),
                clean_latents=jnp.take(latents, tb.clean_sel, axis=0))
            return inner(state, base_params, r_loss, inputs)

        self._jit_step = jax.jit(full_step, donate_argnums=(0,))
        return self._place_state(state)

    def _build_offload(self, max_blocks: int) -> TrainState:
        """Host-offloaded AdamW (cfg.offload_optimizer): the single-chip
        full-depth path. bf16 params + transient grads in HBM; f32
        master/mu/nu in pinned_host; update math as host compute
        (training/offload.py — the TPU analogue of the reference's
        DeepSpeed ZeRO-offload, stage3_offload_bf16_dp.json:10-19).

        The step is an EAGER orchestrator of several jitted programs, so
        ``self._jit_step`` here is a plain callable with the same
        signature as the jitted path — the loop does not care."""
        if self.mesh is not None:
            raise ValueError("offload_optimizer is the single-chip "
                             "full-depth path; use ZeRO over the mesh "
                             "(--mesh_data/--zero3) instead")
        if self.cfg.use_lora:
            raise ValueError("offload_optimizer is for full-parameter "
                             "training; LoRA state fits HBM directly")
        if self.cfg.use_ema:
            raise ValueError("offload_optimizer does not support EMA "
                             "(neither does the reference's offload recipe)")
        from .offload import init_offload_state, make_offload_train_step

        if self.cfg.mixed_precision == "bf16":
            # cast leaf-by-leaf under jit: a whole-tree f32->bf16 cast
            # would transiently hold both trees (22.8G at 3.8B) in HBM
            cast = jax.jit(lambda x: x.astype(jnp.bfloat16))
            self._init_params = jax.tree.map(
                lambda x: cast(x) if jnp.issubdtype(x.dtype, jnp.floating)
                else x, self._init_params)
        ostate = init_offload_state(self._init_params)
        off_step = make_offload_train_step(
            self.model, self.cfg, max_blocks,
            grad_splits=self.cfg.offload_grad_splits)
        vae = self.vae
        enc = jax.jit(lambda vp, pixels, r: jax.lax.stop_gradient(
            vae.apply(vp, pixels, r, method=AutoencoderKL.encode)))
        self._base_params = None

        def full_step(state: TrainState, base_params, vae_params, rng,
                      tb: TrainBatch):
            r_enc, r_loss = jax.random.split(rng)
            latents = enc(vae_params, tb.pixels, r_enc)
            inputs = tb.inputs._replace(
                x1=jnp.take(latents, tb.noisy_sel, axis=0),
                clean_latents=jnp.take(latents, tb.clean_sel, axis=0))
            # consumes state.params and state.opt_state buffers (mu/nu/
            # master donated in place; stale bf16 params freed mid-step)
            params, new_ostate, metrics = off_step(
                state.params, state.opt_state, r_loss, inputs)
            return TrainState(state.step + 1, params, new_ostate,
                              None), metrics

        self._jit_step = full_step
        return TrainState(step=jnp.zeros((), jnp.int32),
                          params=self._init_params, opt_state=ostate,
                          ema_params=None)

    # ---- loop --------------------------------------------------------------

    def run(self, max_steps: int, log_writer=None) -> TrainState:
        if self.cfg.max_steps is None:
            # bind the run's step budget BEFORE the optimizer is built:
            # the cosine schedule decays over exactly this horizon
            import dataclasses
            self.cfg = dataclasses.replace(self.cfg, max_steps=max_steps)
        cfg = self.cfg
        os.makedirs(cfg.results_dir, exist_ok=True)
        with open(os.path.join(cfg.results_dir, "train_args.json"), "w") as f:
            json.dump({"train": cfg.__dict__,
                       "model": {k: str(v) for k, v in
                                 self.model_cfg.__dict__.items()}}, f,
                      indent=2, default=str)
        ckpt_dir = os.path.join(cfg.results_dir, "checkpoints")

        import contextlib
        with contextlib.ExitStack() as stack:
            if self.mesh is not None:
                stack.enter_context(jax.sharding.set_mesh(self.mesh))
            return self._run_inner(max_steps, log_writer, ckpt_dir)

    def _run_inner(self, max_steps: int, log_writer, ckpt_dir: str):
        cfg = self.cfg
        tb = self._example_batch()
        state = self._build(tb)
        start_step = 0
        if cfg.auto_resume and ckpt.latest_step(ckpt_dir) is not None:
            state, start_step = ckpt.restore_checkpoint(ckpt_dir, state)
            state = self._place_state(state)
            if cfg.offload_optimizer:
                from .offload import repin_offload_state
                state = state._replace(
                    opt_state=repin_offload_state(state.opt_state))
            print(f"resumed from step {start_step}")

        n_img = tokens_per_frame(*self.target_resolution)

        def make_batch(idx: int):
            rows = self._batch_rows
            # raw (un-modulo'd) index: the dataset folds the wraparound in
            # as an epoch term so revisits re-roll the clip window while
            # staying a pure function of (seed, shard, index)
            samples = [self.dataset.sample(idx * rows + i)
                       for i in range(rows)]
            return collate(samples, n_img, sp_multiple=self._sp,
                           cls_weight=cfg.cls_weight,
                           uncond=cfg.distill_guidance is not None)

        from ..data.prefetch import Prefetcher
        from ..parallel.distributed import GracefulShutdown
        prefetcher = Prefetcher(make_batch, depth=cfg.prefetch_depth,
                                workers=cfg.num_workers, start=start_step)
        shutdown = GracefulShutdown()
        writer = ckpt.CheckpointWriter(ckpt_dir)

        t0 = time.time()
        running = []
        try:
            return self._loop(start_step, max_steps, state, prefetcher,
                              shutdown, writer, log_writer, t0, running)
        finally:
            prefetcher.close()
            writer.close()  # drain any in-flight async save

    def _loop(self, start_step, max_steps, state, prefetcher, shutdown,
              writer, log_writer, t0, running):
        cfg = self.cfg
        # a checkpoint for start_step exists only on a resumed run
        last_saved = start_step if start_step > 0 else None
        for step_idx in range(start_step, max_steps):
            if shutdown.requested.is_set():
                if last_saved != step_idx:
                    writer.save(step_idx, state)
                    last_saved = step_idx
                writer.wait()  # durable before the process exits
                print(f"shutdown requested: checkpoint-{step_idx} durable",
                      flush=True)
                break
            tb = self._shard_batch(prefetcher.get())
            # per-step key derived from the global step: resumed runs
            # continue the noise stream instead of replaying it
            r = jax.random.fold_in(self.rng, step_idx)
            state, metrics = self._jit_step(state, self._base_params,
                                            self._vae_params, r, tb)
            # keep the device array: float() here would sync every step and
            # stall async dispatch
            running.append(metrics["loss"])

            if (step_idx + 1) % cfg.log_every == 0 or step_idx == start_step:
                dt = time.time() - t0
                sps = len(running) / max(dt, 1e-9)
                mean_loss = float(np.mean([float(x) for x in running]))
                msg = (f"step {step_idx + 1}: loss={mean_loss:.4f} "
                       f"grad_norm={float(metrics['grad_norm']):.3f} "
                       f"steps/sec={sps:.3f}")
                print(msg, flush=True)
                if log_writer is not None:
                    log_writer.add_scalar("train/loss", mean_loss,
                                          step_idx + 1)
                    log_writer.add_scalar("train/grad_norm",
                                          float(metrics["grad_norm"]),
                                          step_idx + 1)
                    log_writer.add_scalar("train/steps_per_sec", sps,
                                          step_idx + 1)
                running, t0 = [], time.time()

            if (step_idx + 1) % cfg.ckpt_every == 0:
                # async: serialisation overlaps the next training steps
                writer.save(step_idx + 1, state)
                last_saved = step_idx + 1
                print(f"saving checkpoint-{step_idx + 1} (async)",
                      flush=True)
        return state
