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
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, SchedulerConfig
from ..layout import frame_block_inference_layout
from ..models.vae import AutoencoderKL, VAEConfig
from ..models.video_gpt import Batch, VideoGPT
from ..data.processor import postprocess_frames, preprocess_frames
from .scheduler import sample, sample_separate_cfg


@dataclasses.dataclass
class VideoGPTPipeline:
    model: VideoGPT
    params: dict
    vae: AutoencoderKL
    vae_params: dict
    # sequence-parallel serving (reference: inference_nv.sh SP=4): a
    # Mesh('data','seq') — the model must be built with seq_shard=True and
    # sp_attention='ulysses' (cls.build does this when mesh is given). The
    # prefix KV cache lives head-sharded; each denoise step all_to_alls
    # only the tail (parallel/ulysses.py:ulysses_attend_cached).
    mesh: Optional[object] = None

    @classmethod
    def build(cls, cfg: ModelConfig, params: dict, vae_cfg: VAEConfig,
              vae_params: dict, dtype=jnp.bfloat16,
              mesh=None) -> "VideoGPTPipeline":
        if mesh is not None:
            cfg = dataclasses.replace(cfg, seq_shard=True,
                                      sp_attention="ulysses")
        return cls(model=VideoGPT(cfg, dtype=dtype), params=params,
                   vae=AutoencoderKL(vae_cfg, dtype=dtype),
                   vae_params=vae_params, mesh=mesh)

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

    @functools.cached_property
    def _decode_u8(self):
        """VAE decode fused with the [-1,1] -> uint8 pixel conversion: the
        same f32 ops as the host path in data.processor.postprocess_frames
        (bit-identical bytes), but run on device so the emit path ships 4x
        fewer bytes and does no host float math (measured 0.42s/24 frames
        on the host, scripts/profile_rollout.py)."""
        @jax.jit
        def fn(vae_params, latents):
            px = self.vae.apply(vae_params, latents,
                                method=AutoencoderKL.decode)
            x = jnp.clip(px.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
            return (x * 255.0).astype(jnp.uint8)
        return fn

    def _jit_cached(self, key, builder):
        cache_dict = self.__dict__.setdefault("_block_fns", {})
        if key not in cache_dict:
            cache_dict[key] = builder()
        return cache_dict[key]

    def _prefill_fn(self, prefix_len: int):
        model = self.model

        def build():
            @jax.jit
            def fn(params, batch_c: Batch, clean_latents):
                return model.apply(params, batch_c, clean_latents,
                                   prefix_len, method=VideoGPT.prefill)
            return fn
        return self._jit_cached(("prefill", prefix_len), build)

    def _extend_fn(self, old_len: int, new_len: int, n_prev_clean: int):
        """Cross-block cache growth: only the previous block's predictions
        (now clean conditions) run through the trunk, against the existing
        cache — instead of re-prefilling the whole prefix every block."""
        model = self.model

        def build():
            @jax.jit
            def fn(params, batch_c: Batch, new_latents, cache):
                return model.apply(params, batch_c, new_latents, cache,
                                   new_len, n_prev_clean,
                                   method=VideoGPT.extend_cache)
            return fn
        return self._jit_cached(("extend", old_len, new_len, n_prev_clean),
                                build)

    def _denoise_fn(self, tail_len: int, num_steps: int, time_shift: float,
                    prediction_type: str, use_cfg: bool, cfg_scale: float,
                    columnar: bool, cached: bool,
                    cfg_interval: Optional[tuple] = None,
                    uncond_refresh: int = 1):
        """The denoise scan per sequence signature.

        With guidance the CFG pair runs SEPARATELY at its natural lengths
        (OmniGen/model.py:376-402): the conditional row decodes against the
        cache, the unconditional context (no clean frames) is a tail-only
        forward with ~2/3 the keys and no pad tokens. Measured FASTER on
        v5e than the batched B=2 pair even though two M=3552 matmul calls
        run under the batched rate — XLA overlaps the two independent
        programs, hiding the VPU-bound attention of one under the MXU-bound
        matmuls of the other (5.26s vs 4.73s p50 at flagship shapes).
        Numerically identical to the reference's padded pair
        (tests/test_separate_cfg.py)."""
        sched = SchedulerConfig(num_steps=num_steps,
                                time_shifting_factor=time_shift,
                                prediction_type=prediction_type,
                                cfg_interval=cfg_interval,
                                uncond_refresh=uncond_refresh)
        model = self.model
        from ..models.video_gpt import decode_mask, maybe_bias

        def tail_bias(batch: Batch, tl: int):
            # step-invariant: evaluated ONCE, outside the denoise scan.
            # ``columnar`` (validated host-side by layout.decode_rank)
            # selects the O(L) per-key-rank mask over the O(Lq*Lk) bias.
            q_meta = batch.meta.tail(tl) if tl else batch.meta
            if columnar:
                return decode_mask(q_meta, batch.meta)
            return maybe_bias(model.cfg, q_meta, batch.meta)

        def build():
            @jax.jit
            def fn(params, batch_c: Batch, batch_u: Optional[Batch],
                   cache, z0):
                bias_c = tail_bias(batch_c, tail_len if cached else 0)

                def denoise_cond(z, t):
                    if not cached:
                        return model.apply(params, batch_c, z, t,
                                           bias=bias_c)
                    return model.apply(params, batch_c, z, t, cache,
                                       tail_len, bias_c,
                                       method=VideoGPT.decode)

                if not use_cfg:
                    return sample(z0, denoise_cond, sched, use_cfg=False)

                bias_u = tail_bias(batch_u, 0)

                def denoise_pair(z, t):
                    return (denoise_cond(z, t),
                            model.apply(params, batch_u, z, t, bias=bias_u))

                # steps outside cfg_interval compile NO uncond forward
                return sample_separate_cfg(z0, denoise_pair, sched,
                                           cfg_scale,
                                           denoise_cond_fn=denoise_cond)
            return fn
        return self._jit_cached(
            ("denoise", tail_len, num_steps, time_shift, prediction_type,
             use_cfg, cfg_scale, columnar, cached, cfg_interval,
             uncond_refresh), build)

    # ---- public API ----------------------------------------------------------

    def generate(self, input_frames, **kwargs):
        """See :meth:`_generate`. Runs under the pipeline's mesh (sequence-
        parallel serving) when one was configured."""
        if self.mesh is not None:
            with jax.sharding.set_mesh(self.mesh):
                return self._generate(input_frames, **kwargs)
        return self._generate(input_frames, **kwargs)

    def _generate(
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
        vae_roundtrip_recycle: bool = False,
        cfg_interval: Optional[Tuple[float, float]] = None,
        uncond_refresh: int = 1,
    ):
        """Condition on ``input_frames``, roll out ``gen_nums`` clips.

        Returns PIL frames: the (VAE-roundtripped) conditioning frames of the
        FIRST block's window first (like the reference, window sliding
        applies before the initial emit — LVM/pipeline.py:418-422, 558-570),
        then every generated frame (LVM/pipeline.py:572-590).

        ``vae_roundtrip_recycle`` reproduces the reference's recycled-frame
        semantics exactly: each predicted latent is VAE-decoded and the
        PIXELS are re-encoded as the next block's condition
        (LVM/pipeline.py:491-498). The default (False) feeds the predicted
        latent back directly — one fewer lossy VAE round-trip per recycled
        frame and no extra encode work; a deliberate, documented divergence.

        ``cfg_interval=(lo, hi)`` applies guidance only where sigma is in
        ``[lo, hi)`` and skips the unconditional forward elsewhere
        (scheduler.cfg_step_flags) — a serving work-reduction knob;
        ``None`` keeps guidance at every step (reference semantics).

        ``uncond_refresh=k`` evaluates the unconditional context only every
        k-th guided step and reuses the cached uncond prediction in between
        (scheduler.step_kinds); 1 = reference semantics. Drift of both
        knobs is measured by scripts/cfg_drift.py.
        """
        if not len(input_frames):
            # the output geometry is derived from the conditioning frames
            # (the reference likewise always conditions on >=1 frame,
            # LVM/inference driver:84-87)
            raise ValueError(
                "generate() needs at least one conditioning frame")
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
        # clean_latents stays ONE stacked device array (n, hl, wl, c) for the
        # whole rollout: per-frame Python lists cost ~2 eager dispatches per
        # frame per block (slice + restack), and on this remote backend each
        # eager op is a round trip — at 24-frame blocks that overhead rivaled
        # the denoise itself
        clean_latents = self._encode(self.vae_params,
                                     jnp.asarray(pixels, dtype), erng)

        outputs: List = []
        # one-behind emit queue: each block's decoded frames (device
        # arrays) are converted to host PIL images only AFTER the next
        # block's work has been dispatched, so the d2h + host postprocess
        # overlap device compute instead of stalling the dispatch thread
        pending_emits: List = []

        def _drain_emits():
            while pending_emits:
                x = pending_emits.pop(0)
                x = (np.asarray(x) if x.dtype == jnp.uint8
                     else np.asarray(x, np.float32))
                outputs.extend(postprocess_frames(x))

        out_latents: List = []  # one stacked array per block
        emit_initial = True
        # cross-block KV cache: (device cache, frames covered); reusable
        # only while the window hasn't slid (positions restart on slide) and
        # recycled predictions aren't re-noised (re-noise changes their K/V)
        kv_cache = None
        kv_frames = 0
        for k, gen_num in enumerate(gen_nums):
            if int(clean_latents.shape[0]) + gen_num > max_frame_window:
                clean_latents = clean_latents[
                    gen_num + int(clean_latents.shape[0]) - max_frame_window:]
                kv_cache, kv_frames = None, 0
            if k > 0 and clean_image_noise_level:
                kv_cache, kv_frames = None, 0
            n_clean = int(clean_latents.shape[0])
            layout_c = frame_block_inference_layout(
                n_clean, gen_num, n_img, use_cfg=False)
            batch_c = Batch.from_layout(layout_c)
            tail = layout_c.noisy_tail_len()
            prefix = layout_c.length - tail
            batch_u = None
            layout_u = None
            if use_img_guidance:
                # unconditional context at its NATURAL length (no clean
                # frames, no pads) — see _denoise_fn
                layout_u = frame_block_inference_layout(
                    0, gen_num, n_img, use_cfg=False)
                batch_u = Batch.from_layout(layout_u)

            cl = clean_latents
            if k > 0 and clean_image_noise_level:
                # re-noise recycled predictions (LVM/pipeline.py:496-497)
                rng, nrng = jax.random.split(rng)
                lvl = clean_image_noise_level
                cl = (1.0 - lvl) * cl + lvl * jax.random.normal(
                    nrng, cl.shape, cl.dtype)

            rng, zrng = jax.random.split(rng)
            z = jax.random.normal(zrng, (gen_num, hl, wl, c), dtype)

            from ..layout import decode_rank
            columnar = decode_rank(layout_c, tail) is not None and (
                not use_img_guidance
                or decode_rank(layout_u, layout_u.length) is not None)
            if prefix > 0:
                n_new = n_clean - kv_frames
                if kv_cache is not None and 0 < n_new < n_clean:
                    seg = n_img + 2
                    kv_cache = self._extend_fn(
                        kv_frames * seg, n_new * seg, kv_frames)(
                        self.params, batch_c, cl[-n_new:], kv_cache)
                elif kv_cache is None or n_new != 0:
                    kv_cache = self._prefill_fn(prefix)(
                        self.params, batch_c, cl)
                kv_frames = n_clean
            else:
                kv_cache, kv_frames = None, 0
            fn = self._denoise_fn(tail, num_inference_steps,
                                  time_shifting_factor, prediction_type,
                                  use_img_guidance, img_guidance_scale,
                                  columnar, cached=prefix > 0,
                                  cfg_interval=cfg_interval,
                                  uncond_refresh=uncond_refresh)
            samples = fn(self.params, batch_c, batch_u, kv_cache, z)
            # previous block's frames: dispatched before this block's
            # denoise, converted after — the host PIL work rides under it
            _drain_emits()

            if emit_initial:
                # emit the VAE round-trip of the conditioning frames
                if n_clean:
                    pending_emits.append(self._decode_u8(
                        self.vae_params, clean_latents))
                emit_initial = False

            recycled = samples
            if vae_roundtrip_recycle:
                # reference semantics: re-encode the DECODED pixels
                # (LVM/pipeline.py:491-498); the extend/prefill of the next
                # block reads clean_latents, so the KV cache stays consistent
                out_px = self._decode(self.vae_params, samples)
                pending_emits.append(out_px)
                rng, rrng = jax.random.split(rng)
                recycled = self._encode(self.vae_params,
                                        out_px.astype(dtype), rrng)
            else:
                pending_emits.append(self._decode_u8(self.vae_params,
                                                     samples))
            out_latents.append(samples)
            clean_latents = (jnp.concatenate([clean_latents, recycled])
                             if n_clean else recycled)

        _drain_emits()
        if return_latents:
            return outputs, [l for blk in out_latents for l in blk]
        return outputs

    def generate_batch(self, inputs_list: Sequence[Sequence],
                       seeds: Optional[Sequence[int]] = None, **kwargs):
        """N same-shaped condition clips through ONE B=N program set.

        The reference serves strictly one video at a time (a Python loop
        over pipe calls, LVM inference driver:79-104); here N videos whose
        preprocessed shapes match ride as batch rows of the SAME prefill/
        extend/denoise programs — weights traffic, kernel dispatch, and
        per-step fixed costs amortise across rows. Every video keeps its
        OWN PRNG stream (``seeds[i]``, default ``seed+i``), walking exactly
        the chain :meth:`generate` walks, so outputs match N independent
        calls up to batched-matmul reduction order
        (tests/test_pipeline_e2e.py pins this).

        Returns a list of N per-video frame lists (ordering per
        :meth:`generate`); with ``return_latents=True``, a list of
        (frames, latents) pairs."""
        if self.mesh is not None:
            with jax.sharding.set_mesh(self.mesh):
                return self._generate_batch(inputs_list, seeds, **kwargs)
        return self._generate_batch(inputs_list, seeds, **kwargs)

    def _generate_batch(
        self, inputs_list, seeds=None,
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
        vae_roundtrip_recycle: bool = False,
        cfg_interval: Optional[Tuple[float, float]] = None,
        uncond_refresh: int = 1,
    ):
        n_vid = len(inputs_list)
        if n_vid == 1 and seeds is None:
            out = self._generate(
                inputs_list[0], gen_nums, num_inference_steps,
                img_guidance_scale, use_img_guidance, max_input_image_size,
                max_frame_window, clean_image_noise_level,
                time_shifting_factor, prediction_type, seed, return_latents,
                vae_roundtrip_recycle, cfg_interval, uncond_refresh)
            return [out]
        if img_guidance_scale == 1.0:
            use_img_guidance = False
        base = 0 if seed is None else seed
        if seeds is None:
            seeds = [base + i for i in range(n_vid)]
        assert len(seeds) == n_vid
        dtype = self.model.dtype

        pix = [preprocess_frames(f, max_input_image_size)
               for f in inputs_list]
        shapes = {p.shape for p in pix}
        if len(shapes) != 1:
            raise ValueError(
                f"generate_batch needs same-shaped videos after "
                f"preprocessing; got {sorted(shapes)} — group by bucket "
                "and batch each group")
        H, W = pix[0].shape[1:3]
        f = self.vae.cfg.downsample_factor
        p_ = self.model.cfg.patch_size
        hl, wl = H // f, W // f
        n_img = (hl // p_) * (wl // p_)
        c = self.model.cfg.in_channels

        # one PRNG chain per video — the exact chain _generate walks
        rngs = [jax.random.PRNGKey(s) for s in seeds]

        def chain(i, n=2):
            nonlocal rngs
            out = jax.random.split(rngs[i], n)
            rngs[i] = out[0]
            return out[1:]

        # one stacked (n_vid, n_frames, hl, wl, c) device array, same
        # rationale as _generate: no per-frame eager slicing per block
        # (encodes stay per-video so each video's PRNG chain is exact)
        clean_all = jnp.stack([
            self._encode(self.vae_params, jnp.asarray(pix[i], dtype),
                         chain(i)[0])
            for i in range(n_vid)])

        outputs: List[List] = [[] for _ in range(n_vid)]
        out_latents: List[List] = [[] for _ in range(n_vid)]
        pending: List[Tuple[Any, int]] = []  # (device frames [N*F], F)

        def _drain():
            while pending:
                x, per = pending.pop(0)
                x = (np.asarray(x) if x.dtype == jnp.uint8
                     else np.asarray(x, np.float32))
                for i in range(n_vid):
                    outputs[i].extend(
                        postprocess_frames(x[i * per:(i + 1) * per]))

        emit_initial = True
        kv_cache = None
        kv_frames = 0
        for k, gen_num in enumerate(gen_nums):
            if int(clean_all.shape[1]) + gen_num > max_frame_window:
                drop = gen_num + int(clean_all.shape[1]) - max_frame_window
                clean_all = clean_all[:, drop:]
                kv_cache, kv_frames = None, 0
            if k > 0 and clean_image_noise_level:
                kv_cache, kv_frames = None, 0
            n_clean = int(clean_all.shape[1])
            layout_c = frame_block_inference_layout(
                n_clean, gen_num, n_img, use_cfg=False, rows=n_vid)
            batch_c = Batch.from_layout(layout_c)
            tail = layout_c.noisy_tail_len()
            prefix = layout_c.length - tail
            batch_u = None
            layout_u = None
            if use_img_guidance:
                layout_u = frame_block_inference_layout(
                    0, gen_num, n_img, use_cfg=False, rows=n_vid)
                batch_u = Batch.from_layout(layout_u)

            cls_all = clean_all
            if k > 0 and clean_image_noise_level:
                lvl = clean_image_noise_level
                # per-video noise keys walk each video's own PRNG chain
                noise = jnp.stack([
                    jax.random.normal(chain(i)[0], clean_all.shape[1:],
                                      clean_all.dtype)
                    for i in range(n_vid)])
                cls_all = (1.0 - lvl) * clean_all + lvl * noise
            cl_all = cls_all.reshape((-1,) + cls_all.shape[2:])

            zs = []
            for i in range(n_vid):
                (zrng,) = chain(i)
                zs.append(jax.random.normal(zrng, (gen_num, hl, wl, c),
                                            dtype))
            z = jnp.concatenate(zs, axis=0)

            from ..layout import decode_rank
            columnar = decode_rank(layout_c, tail) is not None and (
                not use_img_guidance
                or decode_rank(layout_u, layout_u.length) is not None)
            if prefix > 0:
                n_new = n_clean - kv_frames
                if kv_cache is not None and 0 < n_new < n_clean:
                    seg = n_img + 2
                    new_lat = cls_all[:, -n_new:].reshape(
                        (-1,) + cls_all.shape[2:])
                    kv_cache = self._extend_fn(
                        kv_frames * seg, n_new * seg, kv_frames)(
                        self.params, batch_c, new_lat, kv_cache)
                elif kv_cache is None or n_new != 0:
                    kv_cache = self._prefill_fn(prefix)(
                        self.params, batch_c, cl_all)
                kv_frames = n_clean
            else:
                kv_cache, kv_frames = None, 0
            fn = self._denoise_fn(tail, num_inference_steps,
                                  time_shifting_factor, prediction_type,
                                  use_img_guidance, img_guidance_scale,
                                  columnar, cached=prefix > 0,
                                  cfg_interval=cfg_interval,
                                  uncond_refresh=uncond_refresh)
            samples = fn(self.params, batch_c, batch_u, kv_cache, z)
            _drain()

            if emit_initial:
                if n_clean:
                    pending.append((self._decode_u8(
                        self.vae_params,
                        clean_all.reshape((-1,) + clean_all.shape[2:])),
                        n_clean))
                emit_initial = False

            recycled = samples
            if vae_roundtrip_recycle:
                out_px = self._decode(self.vae_params, samples)
                pending.append((out_px, gen_num))
                rec = []
                for i in range(n_vid):
                    (rrng,) = chain(i)
                    rec.append(self._encode(
                        self.vae_params,
                        out_px[i * gen_num:(i + 1) * gen_num].astype(dtype),
                        rrng))
                recycled = jnp.concatenate(rec, axis=0)
            else:
                pending.append((self._decode_u8(self.vae_params, samples),
                                gen_num))
            for i in range(n_vid):
                out_latents[i].append(samples[i * gen_num:(i + 1) * gen_num])
            clean_all = jnp.concatenate(
                [clean_all,
                 recycled.reshape((n_vid, gen_num) + recycled.shape[1:])],
                axis=1)

        _drain()
        if return_latents:
            return [(outputs[i], [l for blk in out_latents[i] for l in blk])
                    for i in range(n_vid)]
        return outputs
