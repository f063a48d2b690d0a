"""Optimizer, schedules, EMA, and the jitted train step.

Replaces the reference's Accelerate+DeepSpeed wiring (train_x1_stage1:114-127,
294-296) and manual grad-norm/EMA/clip loop (train:380-408):

- AdamW via optax, LR schedules matching the drivers' choices
  (constant / constant_with_warmup / cosine, train_x1_stage1:506-516)
- global-norm clipping inside the optax chain (train:393)
- EMA as a jitted tree-map (LVM/utils.py:27-34)
- ZeRO-style optimizer-state sharding over the 'data' mesh axis, grads
  reduce-scattered by the SPMD partitioner (replaces ZeRO-2 configs)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.video_gpt import VideoGPT
from .loss import LossInputs, training_loss


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(cfg.lr)
    if cfg.lr_scheduler == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, cfg.lr_warmup_steps),
             optax.constant_schedule(cfg.lr)], [cfg.lr_warmup_steps])
    if cfg.lr_scheduler == "cosine":
        # decay over the RUN's step budget (Trainer.run binds cfg.max_steps
        # from its max_steps argument) — any other horizon silently
        # mis-shapes the schedule
        if not cfg.max_steps:
            raise ValueError(
                "lr_scheduler='cosine' needs TrainConfig.max_steps (the "
                "decay horizon); Trainer.run sets it from its max_steps "
                "argument")
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.lr_warmup_steps,
            max(cfg.max_steps, cfg.lr_warmup_steps + 1))
    raise ValueError(cfg.lr_scheduler)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(lr_schedule(cfg), b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                    eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def init_train_state(model: VideoGPT, params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params["params"] if "params" in params else params),
        ema_params=jax.tree.map(jnp.copy, params) if cfg.use_ema else None,
    )


def ema_update(ema, params, decay: float):
    """EMA tree-map (LVM/utils.py:27-34)."""
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype)
                        * (1.0 - decay), ema, params)


def ema_update_gated(ema, params, cfg: TrainConfig, tx, opt_state):
    """EMA update applied only when the optimizer actually stepped.

    Under gradient accumulation (optax.MultiSteps, make_optimizer) params
    are unchanged between accumulation boundaries; decaying the EMA on every
    micro-step would compound the decay ``accum``x per real optimizer step
    (0.9999^4 at accum=4) — a silent horizon change vs the reference's one
    EMA update per accumulation cycle (train_x1_stage1:406-408). Gate on
    ``MultiSteps.has_updated`` so the EMA sees exactly one decay per
    completed cycle. ``opt_state`` must be the state AFTER ``tx.update``."""
    new_ema = ema_update(ema, params, cfg.ema_decay)
    if cfg.gradient_accumulation_steps > 1:
        did = tx.has_updated(opt_state)
        return jax.tree.map(lambda n, o: jnp.where(did, n, o), new_ema, ema)
    return new_ema


def make_lora_train_step(model: VideoGPT, cfg: TrainConfig,
                         max_blocks: int) -> Callable:
    """Train step where ``state.params`` is a LoRA adapter tree and the base
    weights stay frozen (reference peft path, train_x1_stage1:204-223).

    ``model`` must be built with ``cfg.lora_rank > 0``: the adapters are
    grafted into the tree and act in-model (phi3.LoraDense), so the only
    gradients that ever materialise are the adapter stacks ([layers, *, r])
    — an externally merged kernel would give the scan backward stacked f32
    kernel cotangents (~4.5G at 3.8B) before contracting them to dA/dB.

    The frozen base weights are an explicit argument of the returned
    ``step(state, base_params, rng, inputs)`` — NOT a closure. A closed-over
    tree is baked into the jaxpr as a compile-time constant, which at 3.8B
    both duplicates the ~7.6G bf16 base in HBM and pushes the lowered
    program past the remote-compile request-size limit."""
    from .lora import graft_lora

    if model.cfg.lora_rank <= 0:
        raise ValueError("make_lora_train_step needs a model built with "
                         "ModelConfig.lora_rank > 0 (in-model adapters)")
    tx = make_optimizer(cfg)

    def step(state: TrainState, base_params, rng: jax.Array,
             inputs: LossInputs):
        inner = (base_params["params"] if "params" in base_params
                 else base_params)

        def loss_fn(lora):
            merged = {"params": graft_lora(inner, lora)}
            return training_loss(
                model, merged, rng, inputs, max_blocks=max_blocks,
                input_noise=cfg.input_noise,
                input_output_return=cfg.input_output_return)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_lora = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   "per_frame_loss": aux["per_frame_loss"]}
        return TrainState(state.step + 1, new_lora, opt_state,
                          state.ema_params), metrics

    return step


def make_train_step(model: VideoGPT, cfg: TrainConfig, max_blocks: int,
                    prediction_target: str = "x1",
                    apply_fn=None) -> Callable:
    """Jittable (state, rng, inputs) -> (state, metrics).

    ``prediction_target='velocity'`` selects the OmniGen-family target
    ``ut = x1 - x0`` (OmniGen/train_helper/loss.py:40-45) for the image
    generation path; the video path trains on x1-prediction.

    ``apply_fn`` overrides the forward (model.apply's signature) — the
    pipeline-parallel trunk (parallel.pipeline.pp_apply) plugs in here."""
    tx = make_optimizer(cfg)

    def step(state: TrainState, rng: jax.Array, inputs: LossInputs):
        def loss_fn(p):
            return training_loss(
                model, {"params": p}, rng, inputs, max_blocks=max_blocks,
                input_noise=cfg.input_noise,
                input_output_return=cfg.input_output_return,
                prediction_target=prediction_target, apply_fn=apply_fn)

        inner = state.params["params"]
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(inner)
        updates, opt_state = tx.update(grads, state.opt_state, inner)
        new_inner = optax.apply_updates(inner, updates)
        new_params = {"params": new_inner}
        ema = state.ema_params
        if ema is not None:
            ema = ema_update_gated(ema, new_params, cfg, tx, opt_state)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "per_frame_loss": aux["per_frame_loss"],
        }
        return TrainState(state.step + 1, new_params, opt_state, ema), metrics

    return step
