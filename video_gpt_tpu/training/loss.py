"""Flow-matching training loss (x1-prediction with noisy conditioning).

Semantics of LVM/train_helper/loss.py:128-243, re-expressed for JAX:

- rectified-flow interpolation  x_t = t*x1 + (1-t)*x0  with target x1
  (loss.py:175-181; t==1 is clean)
- ONE timestep per frame-block, shared by the block's frames
  (sample_frame_block_timestep, loss.py:105-113); the stage-1 interleaved
  recipe is the per-frame special case (blocks of 1)
- conditioning frames receive LOW noise: t_input ~ U[input_noise, 1]
  (sample_timestep_max_noise, loss.py:116-119; default 0.9,
  train_x1_stage1:594)
- optional aux input-reconstruction loss (loss.py:220-225) and first-frame
  cls weighting (loss.py:227-232)

The reference broadcasts x0/t across the SP group so ranks agree
(loss.py:150-172); here determinism is structural — one PRNG key drives the
whole step regardless of the mesh.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.video_gpt import Batch, VideoGPT
from ..sampling.scheduler import add_noise_x1


class LossInputs(NamedTuple):
    """Static-shape per-step training example (built from a SequenceLayout +
    VAE-encoded frames by training/data.py)."""

    batch: Batch
    x1: jax.Array                # [Nn, hl, wl, C] target latents
    clean_latents: jax.Array     # [Nc, hl, wl, C]
    noisy_frame_row: jax.Array   # [Nn] int32
    noisy_frame_block: jax.Array  # [Nn] int32
    frame_weights: Optional[jax.Array] = None  # [Nn] loss weights (host-built
    # from the layout; covers the reference's cls_weight, loss.py:227-232)
    clean_weights: Optional[jax.Array] = None  # [Nc] 1.0 for real clean
    # frames, 0.0 for shape-padding slots (training/data.py collation)
    batch_uncond: Optional[Batch] = None  # unconditional-branch layout
    # ('uncond' scheme: same rows/blocks, noisy frames only, same noisy
    # order) — present only for guidance distillation (distill_guidance)


def sample_block_timesteps(rng: jax.Array, frame_row: jax.Array,
                           frame_block: jax.Array, num_rows: int,
                           max_blocks: int, exp_time: bool = False
                           ) -> jax.Array:
    """One uniform t per (row, block), gathered per frame: frames of the same
    block share their timestep (loss.py:105-113). ``exp_time`` uses the
    logistic-normal alternative (loss.py:98-102)."""
    if exp_time:
        u = jax.random.normal(rng, (num_rows, max_blocks))
        table = jax.nn.sigmoid(u)
    else:
        table = jax.random.uniform(rng, (num_rows, max_blocks))
    return table[frame_row, frame_block]


def training_loss(
    model: VideoGPT,
    params,
    rng: jax.Array,
    inputs: LossInputs,
    max_blocks: int,
    input_noise: float = 0.9,
    exp_time: bool = False,
    input_output_return: bool = False,
    order: int = 2,
    prediction_target: str = "x1",  # 'x1' (video path) | 'velocity'
                                    # (OmniGen family: ut = x1 - x0,
                                    # OmniGen/train_helper/loss.py:40-45)
    apply_fn=None,  # forward override with model.apply's signature
                    # (params, batch, xt, t, clean, input_output_return=...)
                    # — e.g. the pipeline-parallel trunk
                    # (parallel.pipeline.pp_apply)
):
    """Returns (scalar loss, aux dict with per-frame losses). ``max_blocks``
    is static (from the layout) — the timestep table is [rows, max_blocks]."""
    r_x0, r_t, r_x0c, r_tc = jax.random.split(rng, 4)
    x1, clean = inputs.x1, inputs.clean_latents
    num_rows = inputs.batch.input_ids.shape[0]

    x0 = jax.random.normal(r_x0, x1.shape, x1.dtype)
    t = sample_block_timesteps(r_t, inputs.noisy_frame_row,
                               inputs.noisy_frame_block, num_rows,
                               max_blocks, exp_time)
    xt = add_noise_x1(x1, x0, t)

    if clean.shape[0] > 0:
        x0c = jax.random.normal(r_x0c, clean.shape, clean.dtype)
        t_in = input_noise + (1.0 - input_noise) * jax.random.uniform(
            r_tc, (clean.shape[0],))
        clean_in = add_noise_x1(clean, x0c, t_in)
    else:
        clean_in = clean

    call = model.apply if apply_fn is None else apply_fn
    if input_output_return:
        pred, clean_pred = call(
            params, inputs.batch, xt, t, clean_in, input_output_return=True)
    else:
        pred = call(params, inputs.batch, xt, t, clean_in)

    target = x1 if prediction_target == "x1" else (x1 - x0)
    diff = target.astype(jnp.float32) - pred.astype(jnp.float32)
    err = (diff ** order).reshape(diff.shape[0], -1)
    per_frame = jnp.mean(err, axis=-1)  # [Nn]
    if order != 2:
        # the reference rescales the higher-order loss per frame so its
        # magnitude matches the squared loss, with the scale detached
        # (loss.py:211-218): scale_i = mean(err2_i)/mean(err_order_i)
        per_frame2 = jnp.mean((diff ** 2).reshape(diff.shape[0], -1), axis=-1)
        scale = jax.lax.stop_gradient(
            per_frame2 / jnp.where(per_frame == 0.0, 1.0, per_frame))
        per_frame = scale * per_frame
    if inputs.frame_weights is not None:
        per_frame = per_frame * inputs.frame_weights

    aux = {"per_frame_loss": per_frame}
    loss = jnp.mean(per_frame)
    if input_output_return:
        cerr = (clean.astype(jnp.float32)
                - clean_pred.astype(jnp.float32)) ** 2
        per_clean = jnp.mean(cerr.reshape(cerr.shape[0], -1), axis=-1)
        if inputs.clean_weights is not None:
            # exclude shape-padding clean slots from the aux loss
            w = inputs.clean_weights.astype(jnp.float32)
            per_clean = per_clean * w
            n_clean = jnp.maximum(jnp.sum(w), 1.0)
        else:
            n_clean = per_clean.shape[0]
        aux["input_loss"] = per_clean
        # reference concatenates input losses into the loss vector
        # (loss.py:220-225): equivalent to averaging over all frames
        total = jnp.sum(per_frame) + jnp.sum(per_clean)
        loss = total / (per_frame.shape[0] + n_clean)
    return loss, aux
