"""Collation: clip samples -> fixed-shape device batches.

Counterpart of TrainDataCollator / TrainDataCollator_FrameBlock
(LVM/train_helper/data.py:405-537), with one crucial TPU-side difference:
every batch of a given (rows, frames, resolution) signature has identical
array shapes — the sequence is padded to the worst-case frame-block layout
and the clean-frame side to its maximum count — so the jitted train step
compiles exactly once. The reference re-pads per batch and relies on
dynamic-shape torch kernels.
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

import jax.numpy as jnp

from ..layout import RowSpec, build_layout
from ..models.video_gpt import Batch
from .loss import LossInputs


class TrainBatch(NamedTuple):
    inputs: LossInputs
    pixels: jnp.ndarray       # [B*F, H, W, 3] in [-1, 1]
    noisy_sel: jnp.ndarray    # [Nn] -> row-major frame index into pixels
    clean_sel: jnp.ndarray    # [Nc_max] (padded entries point at frame 0)
    clean_valid: jnp.ndarray  # [Nc_max] 1.0 for real clean frames


def collate(samples: Sequence, n_img: int, sp_multiple: int = 1,
            cls_weight: float = None, uncond: bool = False) -> TrainBatch:
    """samples: ClipSample list sharing frame_num and resolution.

    ``uncond=True`` additionally builds the unconditional-branch layout
    ('uncond' scheme — same rows and block partition, noisy frames only,
    identical noisy-frame order) for guidance distillation
    (TrainConfig.distill_guidance). Its length is F*seg regardless of the
    block partition, so the jitted step still compiles once."""
    F = samples[0].pixels.shape[0]
    B = len(samples)
    seg = n_img + 2
    pad_to = 2 * F * seg  # worst case: every block but the last duplicated
    if pad_to % sp_multiple:
        pad_to += sp_multiple - pad_to % sp_multiple

    specs = [RowSpec(tuple(s.frame_blocks), "training") for s in samples]
    layout = build_layout(specs, n_img, pad_to_multiple=sp_multiple,
                          pad_to=pad_to)
    batch_uncond = None
    if uncond:
        pad_u = F * seg
        if pad_u % sp_multiple:
            pad_u += sp_multiple - pad_u % sp_multiple
        layout_u = build_layout(
            [RowSpec(tuple(s.frame_blocks), "uncond") for s in samples],
            n_img, pad_to_multiple=sp_multiple, pad_to=pad_u)
        assert layout_u.num_noisy_frames == layout.num_noisy_frames
        batch_uncond = Batch.from_layout(layout_u)

    nn_ = layout.num_noisy_frames
    assert nn_ == B * F
    nc_max = max(B * (F - 1), 1)
    nc = layout.num_clean_frames

    noisy_sel = layout.noisy_frame_row * F + layout.noisy_video_frame
    clean_sel = np.zeros((nc_max,), np.int32)
    clean_valid = np.zeros((nc_max,), np.float32)
    clean_sel[:nc] = layout.clean_frame_row * F + layout.clean_video_frame
    clean_valid[:nc] = 1.0

    clean_gather = np.zeros((nc_max, n_img), np.int32)
    clean_gather[:nc] = layout.clean_gather
    layout.clean_gather = clean_gather  # fixed-shape view for the aux head

    pixels = np.concatenate([s.pixels for s in samples], axis=0)
    frame_weights = None
    if cls_weight is not None:
        # up-weight the first frame of each clip (reference cls_weight,
        # LVM/train_helper/loss.py:227-232)
        frame_weights = jnp.asarray(np.where(
            layout.noisy_video_frame == 0, cls_weight, 1.0
        ).astype(np.float32))
    inputs = LossInputs(
        batch=Batch.from_layout(layout),
        x1=None,                      # filled on device after VAE encode
        clean_latents=None,
        noisy_frame_row=jnp.asarray(layout.noisy_frame_row),
        noisy_frame_block=jnp.asarray(layout.noisy_frame_block),
        frame_weights=frame_weights,
        clean_weights=jnp.asarray(clean_valid),
        batch_uncond=batch_uncond,
    )
    return TrainBatch(
        inputs=inputs,
        pixels=jnp.asarray(pixels),
        noisy_sel=jnp.asarray(noisy_sel),
        clean_sel=jnp.asarray(clean_sel),
        clean_valid=jnp.asarray(clean_valid),
    )
