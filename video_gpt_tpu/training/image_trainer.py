"""Training loop for the image-generation (OmniGen ancestor) family.

Counterpart of OmniGen/train.py semantics reachable through the reference's
train_helper (json dataset + condition dropout + velocity target,
OmniGen/train_helper/data.py:19-110, OmniGen/train_helper/loss.py:40-45),
sharing this repo's video-training machinery: optax AdamW/EMA/clip
(train_state.py), orbax checkpoints, prefetcher.

One jitted program per step: VAE-encode output+input images -> velocity
flow-matching loss -> backward -> AdamW -> EMA.
"""
from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MeshConfig, ModelConfig, TrainConfig
from ..data.image_text import (ImageGenTrainBatch, ImageTextDataset,
                               collate_image_gen)
from ..image_gen import ImageGenProcessor
from ..models.vae import AutoencoderKL, VAEConfig
from ..models.video_gpt import VideoGPT
from ..utils import checkpoint as ckpt
from .train_state import TrainState, init_train_state, make_train_step


class ImageGenTrainer:
    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        json_file: str,
        image_root: Optional[str],
        tokenizer,
        output_size: Tuple[int, int] = (512, 512),
        input_size: Optional[Tuple[int, int]] = None,
        condition_dropout_prob: float = 0.1,
        max_input_images: int = 3,
        pad_to: Optional[int] = None,
        vae_cfg: VAEConfig = VAEConfig(),
        vae_params=None,
        init_params=None,
        mesh_cfg: Optional[MeshConfig] = None,
        seed: int = 0,
    ):
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        dtype = jnp.bfloat16 if train_cfg.mixed_precision == "bf16" \
            else jnp.float32
        # mesh: same data x seq wiring as the video Trainer (the reference
        # trains OmniGen under accelerate/FSDP; here it's one flag)
        self.mesh = None
        self._dp = 1
        self._sp = 1
        self._tp = 1
        self._zero_params = False
        if mesh_cfg is not None and mesh_cfg.num_devices > 1:
            from ..parallel.mesh import make_mesh
            if mesh_cfg.pipe > 1:
                raise ValueError("pipeline parallelism is wired for the "
                                 "video Trainer; use dp/sp/tensor here")
            self.mesh = make_mesh(mesh_cfg)
            self._dp = mesh_cfg.data
            self._sp = mesh_cfg.seq
            self._tp = mesh_cfg.tensor
            self._zero_params = mesh_cfg.zero_params
        overrides = {}
        if self._sp > 1:
            overrides["seq_shard"] = True
            overrides["sp_attention"] = train_cfg.sp_attention
        if self._tp > 1 and model_cfg.tensor_parallel != self._tp:
            overrides["tensor_parallel"] = self._tp
        if train_cfg.gradient_checkpointing and not model_cfg.remat:
            overrides["remat"] = True
        if overrides:
            model_cfg = ModelConfig(**{**model_cfg.__dict__, **overrides})
            self.model_cfg = model_cfg
        self.model = VideoGPT(model_cfg, dtype=dtype, train_init=True)
        self.vae = AutoencoderKL(vae_cfg, dtype=dtype)
        self.processor = ImageGenProcessor(tokenizer,
                                           token_ids=model_cfg.token_ids)
        self.dataset = ImageTextDataset(
            json_file, image_root, self.processor,
            output_size=output_size, input_size=input_size,
            condition_dropout_prob=condition_dropout_prob,
            max_input_length_limit=train_cfg.max_input_length_limit,
            seed=seed,
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )
        self.output_size = output_size
        self.input_size = input_size or output_size
        self.max_input_images = max_input_images
        self.rng = jax.random.PRNGKey(seed)
        self._vae_params = vae_params
        self._init_params = init_params
        # static token budget: text allowance + worst-case image regions +
        # TIME + output tokens (one compiled step per signature)
        n_out = (output_size[0] // 16) * (output_size[1] // 16)
        n_region = ((self.input_size[0] // 16)
                    * (self.input_size[1] // 16))
        limit = train_cfg.max_input_length_limit
        if self._sp > 1:  # Ulysses/ring need L divisible by the seq axis
            limit -= limit % self._sp
        self.pad_to = pad_to if pad_to is not None else min(
            limit, 512 + max_input_images * n_region + 1 + n_out)
        if self._sp > 1:
            self.pad_to += -self.pad_to % self._sp  # still <= limit

    def _collate(self, idx: int) -> ImageGenTrainBatch:
        b = self.cfg.batch_size_per_device * self._dp
        n = len(self.dataset)
        # epoch = visit count of the record; re-rolls condition dropout
        samples = [self.dataset.sample((idx * b + i) % n, (idx * b + i) // n)
                   for i in range(b)]
        return collate_image_gen(samples, self.pad_to, self.max_input_images,
                                 token_ids=self.model_cfg.token_ids)

    def _place_state(self, state: TrainState) -> TrainState:
        """Params replicated (Megatron-sharded under tp); optimizer state
        ZeRO-sharded over 'data'."""
        if self.mesh is None:
            return state
        from ..parallel.mesh import place_train_state
        return place_train_state(state, self.mesh,
                                 zero_params=self._zero_params,
                                 tp=self._tp > 1)

    def _shard_batch(self, tb: ImageGenTrainBatch) -> ImageGenTrainBatch:
        """[B, L] token arrays over (data, seq); image rows over data."""
        if self.mesh is None:
            return tb
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS, SEQ_AXIS
        tok = NamedSharding(self.mesh, P(DATA_AXIS, SEQ_AXIS))
        row = NamedSharding(self.mesh, P(DATA_AXIS))
        repl = NamedSharding(self.mesh, P())
        b = self.cfg.batch_size_per_device * self._dp
        l = tb.inputs.batch.input_ids.shape[1]

        def put(x):
            if not hasattr(x, "ndim"):
                return x
            if x.ndim == 2 and x.shape[:2] == (b, l):
                return jax.device_put(x, tok)
            return jax.device_put(x, repl)

        inputs = jax.tree.map(put, tb.inputs)
        out_px = jax.device_put(
            tb.out_pixels,
            row if tb.out_pixels.shape[0] % self._dp == 0 else repl)
        in_px = jax.device_put(
            tb.in_pixels,
            row if tb.in_pixels.shape[0] % self._dp == 0
            and tb.in_pixels.shape[0] else repl)
        return tb._replace(inputs=inputs, out_pixels=out_px,
                           in_pixels=in_px)

    def _build(self, tb: ImageGenTrainBatch):
        h, w = self.output_size
        f = self.vae.cfg.downsample_factor
        c = self.model_cfg.in_channels
        if self._vae_params is None:
            self._vae_params = self.vae.init(
                jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)),
                jax.random.PRNGKey(2), True)
        if self._init_params is None:
            b = tb.out_pixels.shape[0]
            nc = tb.in_pixels.shape[0]
            z = jnp.zeros((b, h // f, w // f, c))
            cl = jnp.zeros((nc, self.input_size[0] // f,
                            self.input_size[1] // f, c))
            self._init_params = self.model.init(
                jax.random.PRNGKey(3), tb.inputs.batch, z,
                jnp.zeros((b,)), cl)
        vae = self.vae

        def encode_pair(vae_params, tb, rng):
            r_out, r_in, r_loss = jax.random.split(rng, 3)
            x1 = vae.apply(vae_params, tb.out_pixels, r_out,
                           method=AutoencoderKL.encode)
            clean = vae.apply(vae_params, tb.in_pixels, r_in,
                              method=AutoencoderKL.encode)
            return tb.inputs._replace(
                x1=jax.lax.stop_gradient(x1),
                clean_latents=jax.lax.stop_gradient(clean)), r_loss

        if self.cfg.offload_optimizer:
            # host-offloaded AdamW (training/offload.py), same contract as
            # Trainer._build_offload: eager orchestrator behind the jitted
            # step's call signature; image gen = 1 block/row, velocity
            # target (OmniGen/train_helper/loss.py:40-45)
            if self.mesh is not None:
                raise ValueError("offload_optimizer is the single-chip "
                                 "full-depth path; it does not compose "
                                 "with a mesh")
            if self.cfg.use_ema:
                raise ValueError("offload_optimizer does not support EMA")
            from .offload import init_offload_state, make_offload_train_step
            if self.cfg.mixed_precision == "bf16":
                cast = jax.jit(lambda x: x.astype(jnp.bfloat16))
                self._init_params = jax.tree.map(
                    lambda x: cast(x)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    self._init_params)
            ostate = init_offload_state(self._init_params)
            off_step = make_offload_train_step(
                self.model, self.cfg, max_blocks=1,
                prediction_target="velocity",
                grad_splits=self.cfg.offload_grad_splits)
            enc = jax.jit(encode_pair)

            def off_full_step(state: TrainState, vae_params, rng, tb):
                inputs, r_loss = enc(vae_params, tb, rng)
                params, new_ostate, metrics = off_step(
                    state.params, state.opt_state, r_loss, inputs)
                return TrainState(state.step + 1, params, new_ostate,
                                  None), metrics

            self._jit_step = off_full_step
            return TrainState(step=jnp.zeros((), jnp.int32),
                              params=self._init_params, opt_state=ostate,
                              ema_params=None)

        state = init_train_state(self.model, self._init_params, self.cfg)
        inner = make_train_step(self.model, self.cfg, max_blocks=1,
                                prediction_target="velocity")

        def full_step(state: TrainState, vae_params, rng, tb):
            inputs, r_loss = encode_pair(vae_params, tb, rng)
            return inner(state, r_loss, inputs)

        self._jit_step = jax.jit(full_step, donate_argnums=(0,))
        return self._place_state(state)

    def run(self, max_steps: int, log_writer=None) -> TrainState:
        if self.cfg.max_steps is None:
            # bind the run's step budget before the optimizer is built
            # (the cosine schedule decays over exactly this horizon)
            import dataclasses
            self.cfg = dataclasses.replace(self.cfg, max_steps=max_steps)
        import contextlib
        with contextlib.ExitStack() as stack:
            if self.mesh is not None:
                stack.enter_context(jax.sharding.set_mesh(self.mesh))
            return self._run_inner(max_steps, log_writer)

    def _run_inner(self, max_steps: int, log_writer=None) -> TrainState:
        cfg = self.cfg
        os.makedirs(cfg.results_dir, exist_ok=True)
        import json as _json
        with open(os.path.join(cfg.results_dir, "train_args.json"), "w") as f:
            _json.dump({"train": cfg.__dict__,
                        "model": {k: str(v) for k, v in
                                  self.model_cfg.__dict__.items()}}, f,
                       indent=2, default=str)
        ckpt_dir = os.path.join(cfg.results_dir, "checkpoints")
        tb = self._collate(0)
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

        from ..data.prefetch import Prefetcher
        from ..parallel.distributed import GracefulShutdown
        prefetcher = Prefetcher(self._collate, depth=self.cfg.prefetch_depth,
                                workers=self.cfg.num_workers,
                                start=start_step)
        shutdown = GracefulShutdown()
        writer = ckpt.CheckpointWriter(ckpt_dir)
        t0, running = time.time(), []
        last_saved = start_step if start_step > 0 else None
        try:
            for step_idx in range(start_step, max_steps):
                if shutdown.requested.is_set():
                    # preemption: durable checkpoint before exit (mirrors
                    # Trainer._loop; the reference has no elastic story)
                    if last_saved != step_idx:
                        writer.save(step_idx, state)
                        last_saved = step_idx
                    writer.wait()
                    print(f"shutdown requested: checkpoint-{step_idx} "
                          "durable", flush=True)
                    break
                tb = self._shard_batch(prefetcher.get())
                r = jax.random.fold_in(self.rng, step_idx)
                state, metrics = self._jit_step(state, self._vae_params, r,
                                                tb)
                running.append(metrics["loss"])
                if (step_idx + 1) % cfg.log_every == 0 \
                        or step_idx == start_step:
                    sps = len(running) / max(time.time() - t0, 1e-9)
                    mean_loss = float(np.mean([float(x) for x in running]))
                    print(f"step {step_idx + 1}: loss={mean_loss:.4f} "
                          f"grad_norm={float(metrics['grad_norm']):.3f} "
                          f"steps/sec={sps:.3f}", flush=True)
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
                    writer.save(step_idx + 1, state)  # async
                    last_saved = step_idx + 1
        finally:
            prefetcher.close()
            writer.close()
        return state
