"""Autoregressive next-clip prediction pipeline.

TPU-native counterpart of LVMPipeline.prompt_condition_frame_block_
autoregressive_inference (LVM/pipeline.py:347-595). Differences by design:

- Per block, ONE jitted function runs clean-prefix prefill + the full
  ``lax.scan`` denoise trajectory + CFG on device. The reference re-runs the
  full prefix through the transformer at every one of the 50 steps with the
  KV cache disabled (LVM/scheduler.py:174, inference driver:96).
- VAE encode/decode are batched over frames in one call each (the reference
  loops frame-by-frame, LVM/pipeline.py:491-498, 572-590).
- Sliding window (``max_frame_window``) and predicted-frame re-noising
  (``clean_image_noise_level``) preserved (LVM/pipeline.py:420-422, 496-497).

jit functions are cached per sequence signature; with the window saturated
the rollout reuses one compiled program per block.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, SchedulerConfig
from ..layout import frame_block_inference_layout
from ..models.vae import AutoencoderKL, VAEConfig
from ..models.video_gpt import Batch, VideoGPT
from ..data.processor import postprocess_frames, preprocess_frames
from .scheduler import sample


@dataclasses.dataclass
class VideoGPTPipeline:
    model: VideoGPT
    params: dict
    vae: AutoencoderKL
    vae_params: dict

    @classmethod
    def build(cls, cfg: ModelConfig, params: dict, vae_cfg: VAEConfig,
              vae_params: dict, dtype=jnp.bfloat16) -> "VideoGPTPipeline":
        return cls(model=VideoGPT(cfg, dtype=dtype), params=params,
                   vae=AutoencoderKL(vae_cfg, dtype=dtype),
                   vae_params=vae_params)

    # ---- jitted stages (cached per shape signature) -------------------------

    @functools.cached_property
    def _encode(self):
        @jax.jit
        def fn(vae_params, pixels, rng):
            return self.vae.apply(vae_params, pixels, rng,
                                  method=AutoencoderKL.encode)
        return fn

    @functools.cached_property
    def _decode(self):
        @jax.jit
        def fn(vae_params, latents):
            return self.vae.apply(vae_params, latents,
                                  method=AutoencoderKL.decode)
        return fn

    def _block_fn(self, prefix_len: int, tail_len: int, num_steps: int,
                  time_shift: float, prediction_type: str, use_cfg: bool,
                  cfg_scale: float):
        key = (prefix_len, tail_len, num_steps, time_shift, prediction_type,
               use_cfg, cfg_scale)
        cache_dict = self.__dict__.setdefault("_block_fns", {})
        if key in cache_dict:
            return cache_dict[key]
        sched = SchedulerConfig(num_steps=num_steps,
                                time_shifting_factor=time_shift,
                                prediction_type=prediction_type)
        model = self.model

        @jax.jit
        def fn(params, batch: Batch, clean_latents, z0):
            if prefix_len > 0:
                cache = model.apply(params, batch, clean_latents, prefix_len,
                                    method=VideoGPT.prefill)
            else:
                cache = None
            # step-invariant: evaluate the mask bias ONCE, outside the scan
            from ..models.video_gpt import maybe_bias
            bias = maybe_bias(model.cfg, batch.meta.tail(tail_len),
                              batch.meta)

            def denoise(z, t):
                return model.apply(params, batch, z, t, cache, tail_len,
                                   bias, method=VideoGPT.decode)

            return sample(z0, denoise, sched, use_cfg=use_cfg,
                          cfg_scale=cfg_scale)

        cache_dict[key] = fn
        return fn

    # ---- public API ----------------------------------------------------------

    def generate(
        self,
        input_frames: Sequence,
        gen_nums: Sequence[int] = (1,),
        num_inference_steps: int = 50,
        img_guidance_scale: float = 1.0,
        use_img_guidance: bool = True,
        max_input_image_size: int = 320,
        max_frame_window: int = 16,
        clean_image_noise_level: float = 0.1,
        time_shifting_factor: float = 1.0,
        prediction_type: str = "x1",
        seed: Optional[int] = 42,
        return_latents: bool = False,
    ):
        """Condition on ``input_frames``, roll out ``gen_nums`` clips.

        Returns PIL frames: the (VAE-roundtripped) conditioning frames of the
        FIRST block's window first (like the reference, window sliding
        applies before the initial emit — LVM/pipeline.py:418-422, 558-570),
        then every generated frame (LVM/pipeline.py:572-590).
        """
        if img_guidance_scale == 1.0:
            use_img_guidance = False
        rng = jax.random.PRNGKey(0 if seed is None else seed)
        dtype = self.model.dtype

        pixels = preprocess_frames(input_frames, max_input_image_size)
        H, W = pixels.shape[1:3]
        f = self.vae.cfg.downsample_factor
        p = self.model.cfg.patch_size
        hl, wl = H // f, W // f
        n_img = (hl // p) * (wl // p)
        c = self.model.cfg.in_channels

        rng, erng = jax.random.split(rng)
        clean_latents = self._encode(self.vae_params,
                                     jnp.asarray(pixels, dtype), erng)
        clean_latents = [clean_latents[i] for i in range(len(pixels))]

        outputs: List = []
        out_latents: List = []
        emit_initial = True
        for k, gen_num in enumerate(gen_nums):
            if len(clean_latents) + gen_num > max_frame_window:
                clean_latents = clean_latents[
                    gen_num + len(clean_latents) - max_frame_window:]
            n_clean = len(clean_latents)
            layout = frame_block_inference_layout(
                n_clean, gen_num, n_img, use_cfg=use_img_guidance)
            batch = Batch.from_layout(layout)
            tail = layout.noisy_tail_len()
            prefix = layout.length - tail

            cl = jnp.stack(clean_latents) if n_clean else jnp.zeros(
                (0, hl, wl, c), dtype)
            if k > 0 and clean_image_noise_level:
                # re-noise recycled predictions (LVM/pipeline.py:496-497)
                rng, nrng = jax.random.split(rng)
                lvl = clean_image_noise_level
                cl = (1.0 - lvl) * cl + lvl * jax.random.normal(
                    nrng, cl.shape, cl.dtype)

            rng, zrng = jax.random.split(rng)
            z = jax.random.normal(zrng, (gen_num, hl, wl, c), dtype)
            if use_img_guidance:
                z = jnp.concatenate([z, z], axis=0)

            fn = self._block_fn(prefix, tail, num_inference_steps,
                                time_shifting_factor, prediction_type,
                                use_img_guidance, img_guidance_scale)
            samples = fn(self.params, batch, cl, z)
            samples = samples[:gen_num]  # cond half

            if emit_initial:
                # emit the VAE round-trip of the conditioning frames
                if n_clean:
                    init_px = self._decode(self.vae_params, jnp.stack(
                        clean_latents))
                    outputs.extend(postprocess_frames(np.asarray(
                        init_px, np.float32)))
                emit_initial = False

            out_px = self._decode(self.vae_params, samples)
            outputs.extend(postprocess_frames(np.asarray(out_px, np.float32)))
            for i in range(gen_num):
                out_latents.append(samples[i])
                clean_latents.append(samples[i])

        if return_latents:
            return outputs, out_latents
        return outputs
