"""Progressive step-distillation of the flow-matching sampler.

The reference serves at 50 Euler steps (inference_nv.sh:30) and has no
distillation path; the measured serving frontier of this framework
(artifacts/drift_frontier_r05.jsonl, bench_suite `serving_frontier` leg)
shows the remaining throughput beyond schedule tricks lives in *step-count
reduction*, which is a training-time change. This module is that change:
progressive distillation (Salimans & Ho 2022, arXiv:2202.00512) adapted to
the x1-prediction flow-matching objective of LVM/train_helper/loss.py.

One distillation round halves the sampler's step count:

- draw a random grid point ``sigma_i`` of the STUDENT's ``S``-step sigma
  schedule (one per frame-block, like the training loss's per-block shared
  timestep, LVM/train_helper/loss.py:105-113) and form
  ``x_t = sigma_i * x1 + (1 - sigma_i) * x0``;
- roll the FROZEN teacher ``m`` Euler substeps along its own ``S*m``-step
  schedule from ``sigma_i`` to ``sigma_{i+1}`` (the student grid is exactly
  the teacher grid subsampled every ``m`` points — the time-shift map
  ``t/(t+s-s*t)`` is pointwise, so ``sigma_schedule(S*m)[::m] ==
  sigma_schedule(S)``);
- invert ONE student Euler step so that predicting the target lands the
  student exactly where the teacher's ``m`` substeps landed:

      z'      = teacher_rollout(x_t, sigma_i -> sigma_{i+1})
      target  = x_t + (z' - x_t) * (1 - sigma_i) / (sigma_{i+1} - sigma_i)

  (for x1-prediction the Euler update is ``z += (s' - s) * (pred - z)/(1-s)``,
  so the inversion is exact; with ``m = 1`` the target reduces to the
  teacher's own prediction — pinned by tests/test_distill.py);
- regress the student's prediction at ``(x_t, sigma_i)`` onto the target
  (MSE per frame, fp32, stop-gradient through the teacher).

Repeating rounds (teacher <- distilled student, ``S <- S/2``) compounds:
50 -> 25 -> 13 -> 7 -> 4-step samplers. The distilled student keeps the
model's form, so everything downstream — the cached separate-CFG sampler,
cfg_interval / uncond_refresh schedules, SP/TP meshes — applies unchanged;
only ``SchedulerConfig.num_steps`` (and ``time_shifting_factor``, which
must match ``distill_time_shift``) changes at serving.

Conditioning frames are fed CLEAN by default (``distill_input_noise = 1``):
distillation targets the *serving* regime, where the inference driver passes
``clean_image_noise_level 0`` (inference_nv.sh:35) — unlike pretraining's
robustness noise U[0.9, 1] (loss.py:116-119).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.video_gpt import VideoGPT
from ..sampling.scheduler import add_noise_x1, sigma_schedule
from .loss import LossInputs
from .train_state import TrainState, ema_update_gated, make_optimizer


def _per_frame_sigma(sig: jax.Array, idx: jax.Array, x: jax.Array):
    """Gather grid values per frame and shape them for broadcasting."""
    s = sig[idx].astype(jnp.float32)
    return s.reshape((-1,) + (1,) * (x.ndim - 1))


def teacher_rollout(call: Callable, teacher_params, batch, zt: jax.Array,
                    clean_in: jax.Array, sig_teacher: jax.Array,
                    start: jax.Array, substeps: int) -> jax.Array:
    """``substeps`` Euler steps of the frozen teacher along its sigma grid.

    zt: [Nn, hl, wl, C] noisy latents at ``sig_teacher[start]`` (``start``
    is per-frame [Nn] int32 — frames of different blocks sit at different
    grid points). Integrates in fp32; the x1->velocity conversion and the
    Euler update replicate the sampler (sampling/scheduler.py:151-161,
    LVM/scheduler.py:180-204). ``substeps`` is static, so the loop unrolls
    into the jitted program (it is 2 in every classic distillation round).
    """
    z = zt.astype(jnp.float32)
    for j in range(substeps):
        s = _per_frame_sigma(sig_teacher, start + j, z)
        s_next = _per_frame_sigma(sig_teacher, start + j + 1, z)
        t = sig_teacher[start + j].astype(zt.dtype)
        pred = call(teacher_params, batch, z.astype(zt.dtype), t,
                    clean_in).astype(jnp.float32)
        v = (pred - z) / (1.0 - s)
        z = z + (s_next - s) * v
    return jax.lax.stop_gradient(z)


def distillation_loss(
    model: VideoGPT,
    params,
    teacher_params,
    rng: jax.Array,
    inputs: LossInputs,
    max_blocks: int,
    student_steps: int,
    substeps: int = 2,
    time_shift: float = 1.0,
    input_noise: float = 1.0,
    loss_weight: str = "uniform",
    cfg_scale: Optional[float] = None,
    apply_fn=None,
):
    """(scalar loss, aux) — one progressive-distillation regression step.

    ``student_steps`` (S) is the step count the STUDENT is being trained to
    serve at; the teacher is evaluated on the ``S * substeps`` grid. The
    per-(row, block) grid index is drawn uniformly, shared by the block's
    frames — the distillation analogue of the training loss's shared block
    timestep (loss.sample_block_timesteps).

    ``cfg_scale`` switches on GUIDANCE distillation (Meng et al. 2023,
    arXiv:2210.03142 stage 1, adapted to x1-prediction): the teacher's
    prediction becomes the classifier-free-guided combination
    ``uncond + w * (cond - uncond)`` — the exact quantity the serving
    sampler computes (sampling/scheduler.py cfg_mix) — where the
    unconditional branch evaluates the teacher on
    ``inputs.batch_uncond`` (the 'uncond' layout scheme: same rows and
    blocks, noisy frames only, identical noisy-frame order). The student
    regresses onto the guided rollout while keeping its CONDITIONAL
    input, so at serving it replaces the (cond, uncond) pair with ONE
    forward: ``use_cfg=False``, no unconditional row, no uncond KV
    program — half the NFE of separate-CFG on top of any step-count
    reduction.
    """
    r_x0, r_i, r_x0c, r_tc = jax.random.split(rng, 4)
    x1, clean = inputs.x1, inputs.clean_latents
    num_rows = inputs.batch.input_ids.shape[0]
    m = int(substeps)
    sig_t = jnp.asarray(sigma_schedule(student_steps * m, time_shift))

    # per-(row, block) student grid point, gathered per frame
    table = jax.random.randint(r_i, (num_rows, max_blocks), 0, student_steps)
    i = table[inputs.noisy_frame_row, inputs.noisy_frame_block]  # [Nn]
    start = i * m  # teacher grid index of sigma_i
    sigma = sig_t[start]                                   # [Nn] f32

    x0 = jax.random.normal(r_x0, x1.shape, jnp.float32)
    xt = add_noise_x1(x1.astype(jnp.float32), x0, sigma).astype(x1.dtype)

    # conditioning frames: clean at serving (inference_nv.sh:35) unless a
    # robustness noise floor is requested (pretraining uses U[0.9, 1])
    if clean.shape[0] > 0 and input_noise < 1.0:
        x0c = jax.random.normal(r_x0c, clean.shape, clean.dtype)
        t_in = input_noise + (1.0 - input_noise) * jax.random.uniform(
            r_tc, (clean.shape[0],))
        clean_in = add_noise_x1(clean, x0c, t_in)
    else:
        clean_in = clean

    call = model.apply if apply_fn is None else apply_fn
    if cfg_scale is not None:
        if inputs.batch_uncond is None:
            raise ValueError("guidance distillation (cfg_scale set) needs "
                             "inputs.batch_uncond — collate with "
                             "uncond=True (training/data.py)")
        batch_u = inputs.batch_uncond
        empty_clean = clean_in[:0]

        def teacher_call(tp, batch, z, t, cl):
            cond = call(tp, batch, z, t, cl).astype(jnp.float32)
            unc = call(tp, batch_u, z, t, empty_clean).astype(jnp.float32)
            return unc + cfg_scale * (cond - unc)
    else:
        teacher_call = call
    z_prime = teacher_rollout(teacher_call, teacher_params, inputs.batch,
                              xt, clean_in, sig_t, start, m)

    # invert one student Euler step: predicting `target` at sigma_i lands
    # the student exactly at the teacher's z'
    s = _per_frame_sigma(sig_t, start, xt)
    s_next = _per_frame_sigma(sig_t, start + m, xt)
    xt32 = xt.astype(jnp.float32)
    target = xt32 + (z_prime - xt32) * (1.0 - s) / (s_next - s)

    pred = call(params, inputs.batch, xt, sigma.astype(xt.dtype),
                clean_in).astype(jnp.float32)

    diff = target - pred
    per_frame = jnp.mean((diff ** 2).reshape(diff.shape[0], -1), axis=-1)
    if loss_weight == "endpoint":
        # Weight each frame by ((s_next-s)/(1-s))^2 — the square of the
        # inverse of the target's amplification factor — so the loss equals
        # the MSE between the student's LANDED one-Euler-step endpoint and
        # the teacher's landed z'. Balances gradient scale across grid
        # points (plain MSE over-weights early-grid targets by ~S_x; see
        # TrainConfig.distill_loss_weight). Deviates from Salimans & Ho
        # 2022's truncated-SNR weighting, which targets eps-prediction.
        w = ((s_next - s) / (1.0 - s)) ** 2
        per_frame = per_frame * w.reshape(-1)
    elif loss_weight != "uniform":
        raise ValueError(f"distill_loss_weight={loss_weight!r} "
                         "(expected 'uniform' or 'endpoint')")
    if inputs.frame_weights is not None:
        per_frame = per_frame * inputs.frame_weights
    return jnp.mean(per_frame), {"per_frame_loss": per_frame}


def make_distill_train_step(model: VideoGPT, cfg: TrainConfig,
                            max_blocks: int, apply_fn=None) -> Callable:
    """Jittable ``(state, teacher_params, rng, inputs) -> (state, metrics)``.

    The frozen teacher rides as an explicit ARGUMENT, never a closure — a
    closed-over tree is baked into the jaxpr as a compile-time constant,
    which at 3.8B duplicates the ~7.6G bf16 teacher in HBM and pushes the
    lowered program past remote-compile size limits (same constraint as
    make_lora_train_step's frozen base)."""
    if cfg.input_output_return:
        raise ValueError("distillation regresses the denoise head only; "
                         "input_output_return is a pretraining option")
    # Continue-from-teacher recipe: the student starts at the teacher's own
    # discretization gap (tiny loss, tiny grads), and Adam's first step is
    # scale-invariant (m/sqrt(v) ~= +-1), so the pretraining LR moves every
    # param by ~lr REGARDLESS of how small the gap is — measured to spike
    # the loss 80x and never recover within the gap-halving budget. The
    # distillation optimizer therefore runs at cfg.distill_lr (default 1e-4;
    # None inherits cfg.lr for deliberate retunes).
    opt_cfg = (dataclasses.replace(cfg, lr=cfg.distill_lr)
               if cfg.distill_lr is not None else cfg)
    tx = make_optimizer(opt_cfg)

    def step(state: TrainState, teacher_params, rng: jax.Array,
             inputs: LossInputs):
        t_inner = (teacher_params["params"] if "params" in teacher_params
                   else teacher_params)

        def loss_fn(p):
            return distillation_loss(
                model, {"params": p}, {"params": t_inner}, rng, inputs,
                max_blocks=max_blocks,
                student_steps=cfg.distill_student_steps,
                substeps=cfg.distill_substeps,
                time_shift=cfg.distill_time_shift,
                input_noise=cfg.distill_input_noise,
                loss_weight=cfg.distill_loss_weight,
                cfg_scale=cfg.distill_guidance,
                apply_fn=apply_fn)

        inner = state.params["params"]
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(inner)
        updates, opt_state = tx.update(grads, state.opt_state, inner)
        new_params = {"params": optax.apply_updates(inner, updates)}
        ema = state.ema_params
        if ema is not None:
            ema = ema_update_gated(ema, new_params, cfg, tx, opt_state)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   "per_frame_loss": aux["per_frame_loss"]}
        return TrainState(state.step + 1, new_params, opt_state,
                          ema), metrics

    return step
