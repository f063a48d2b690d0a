"""Single-shot text+image -> image generation (the OmniGen ancestor family).

Counterpart of OmniGen/{processor,pipeline,scheduler,model}.py and the LVM
pipeline's ``__call__`` path (LVM/pipeline.py:138-343), re-designed for TPU:

- sequence: ``[pad][prompt text w/ inline input-image regions][TIME][output
  image tokens]`` with a causal prompt, bidirectional input-image regions
  (LVM/processor.py:776-781), and output tokens visible only to themselves —
  all expressed through the same per-token metadata rule as the video path,
  so the Pallas kernel and KV cache apply unchanged.
- the working KV-cache denoise loop the LVM path disabled
  (OmniGen/scheduler.py:155-176): the prompt prefix is prefilled once, each
  of the N steps recomputes only ``[TIME][output tokens]``.
- 2/3-way classifier-free guidance (text / image separation,
  OmniGen/model.py:359-372), batched or separate-per-guidance
  (forward_with_separate_cfg, OmniGen/model.py:376-402).
- velocity prediction (OmniGen/train_helper/loss.py:40-45) via the shared
  Euler sampler.
"""
from __future__ import annotations

import dataclasses
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import ModelConfig, SchedulerConfig
from .data.processor import crop_arr, postprocess_frames
from .layout import NEVER, SequenceLayout
from .models.vae import AutoencoderKL
from .models.video_gpt import Batch, VideoGPT
from .sampling.scheduler import sample, sample_separate_multi
from .tokens import DEFAULT_TOKEN_IDS, Kind, TokenIds

DEFAULT_NEGATIVE_PROMPT = (
    "low quality, jpeg artifacts, ugly, duplicate, morbid, mutilated, extra "
    "fingers, mutated hands, poorly drawn hands, poorly drawn face, "
    "mutation, deformed, blurry, dehydrated, bad anatomy, bad proportions, "
    "extra limbs, cloned face, disfigured, gross proportions, malformed "
    "limbs, missing arms, missing legs, extra arms, extra legs, fused "
    "fingers, too many fingers.")


@dataclasses.dataclass
class TextRow:
    """One prompt row: token ids with inline input-image patch regions."""

    input_ids: List[int]                 # image regions hold slot ids
    image_regions: List[Tuple[int, int]]  # [start, end) within input_ids


def single_shot_layout(rows: Sequence[TextRow], n_out: int,
                       n_region: Optional[int] = None,
                       pad_to_multiple: int = 1,
                       pad_to: Optional[int] = None,
                       token_ids: TokenIds = DEFAULT_TOKEN_IDS
                       ) -> SequenceLayout:
    """Layout for ``[pad][text(+images)][TIME][out image]`` rows, matching
    LVM/processor.py:432-440 (positions), 536-573 (mask) and 776-781
    (bidirectional input-image regions). All rows share ``n_out`` output
    tokens; each input-image region sizes ITSELF from its ``TextRow``
    extent — the reference inserts one region of each image's own token
    length (OmniGen/processor.py:83-91), so mixed-size editing prompts are
    first-class. Passing ``n_region`` asserts all regions have that length
    (the uniform contract the training collator and the aux
    input-reconstruction head rely on; ``clean_gather`` is only emitted for
    uniform regions, since it is a rectangular [Nc, n] table). ``pad_to``
    fixes the total length (shape bucketing for a jitted train step, like
    layout.build_layout). ``clean_src`` indexes the FLAT patch stream of
    the clean regions concatenated in (row, region) order — the order
    VideoGPT's ``_embed_clean_flat`` produces."""
    B = len(rows)
    max_l = max(len(r.input_ids) for r in rows) + n_out + 1
    if pad_to is not None:
        assert pad_to >= max_l, (pad_to, max_l)
        max_l = pad_to
    if max_l % pad_to_multiple:
        max_l += pad_to_multiple - max_l % pad_to_multiple

    arr = {k: np.zeros((B, max_l), np.int32) for k in (
        "input_ids", "pos_ids", "kind", "vis_start", "noisy_block",
        "noisy_role", "q_block", "q_offset", "clean_src", "noisy_src",
        "time_src")}
    arr["input_ids"][:] = token_ids.pad
    arr["kind"][:] = int(Kind.PAD)
    arr["vis_start"][:] = NEVER
    arr["noisy_block"][:] = -1
    arr["q_block"][:] = -1  # no group membership unless assigned below
    for k in ("clean_src", "noisy_src", "time_src"):
        arr[k][:] = -1

    noisy_gather, clean_gather = [], []
    cf_row, cf_vid, nf_row = [], [], []
    flat_off = 0  # running offset into the flat clean patch stream
    uniform = n_region is not None or len({
        e - s for r in rows for (s, e) in r.image_regions}) <= 1
    for b, row in enumerate(rows):
        temp_l = len(row.input_ids)
        pad_l = max_l - temp_l - n_out - 1
        # text prefix: causal
        sl = slice(pad_l, pad_l + temp_l)
        arr["input_ids"][b, sl] = row.input_ids
        arr["kind"][b, sl] = int(Kind.TEXT)
        arr["vis_start"][b, sl] = pad_l + np.arange(temp_l)
        # continuous positions after the pads (LVM/processor.py:432-440)
        arr["pos_ids"][b, pad_l:] = np.arange(temp_l + n_out + 1)
        # input-image regions: causal + bidirectional within the region
        for g, (s, e) in enumerate(row.image_regions):
            n_g = e - s
            if n_region is not None:
                assert n_g == n_region, (s, e, n_region)
            rs = slice(pad_l + s, pad_l + e)
            arr["kind"][b, rs] = int(Kind.CLEAN_IMG)
            arr["noisy_block"][b, rs] = g       # reuse the group mechanism
            arr["q_block"][b, rs] = g
            arr["clean_src"][b, rs] = flat_off + np.arange(n_g)
            flat_off += n_g
            if uniform:
                clean_gather.append(b * max_l + pad_l + s + np.arange(n_g))
            cf_row.append(b)
            cf_vid.append(g)
        # TIME token: causal
        tpos = pad_l + temp_l
        arr["kind"][b, tpos] = int(Kind.TIME)
        arr["vis_start"][b, tpos] = tpos
        arr["input_ids"][b, tpos] = token_ids.slot
        arr["time_src"][b, tpos] = b
        # output image tokens: group-visible only
        out_group = len(row.image_regions) + 1
        osl = slice(tpos + 1, tpos + 1 + n_out)
        arr["kind"][b, osl] = int(Kind.NOISY_IMG)
        arr["input_ids"][b, osl] = token_ids.slot
        arr["noisy_block"][b, osl] = out_group
        arr["q_block"][b, osl] = out_group
        arr["noisy_src"][b, osl] = b * n_out + np.arange(n_out)
        # output rows also see TIME + all text causally via vis_start, and
        # group-visibility handles out<->out; the TIME token must see
        # nothing ahead, matching the tril over text+time
        noisy_gather.append(b * max_l + tpos + 1 + np.arange(n_out))
        nf_row.append(b)

    def _a(x):
        return np.asarray(x, np.int32)

    return SequenceLayout(
        input_ids=arr["input_ids"], pos_ids=arr["pos_ids"],
        kind=arr["kind"], vis_start=arr["vis_start"],
        noisy_block=arr["noisy_block"], noisy_role=arr["noisy_role"],
        q_block=arr["q_block"], q_offset=arr["q_offset"],
        clean_src=arr["clean_src"], noisy_src=arr["noisy_src"],
        time_src=arr["time_src"],
        noisy_gather=_a(noisy_gather),
        # rectangular only for uniform regions (aux-head/training contract);
        # heterogeneous regions have no clean_gather — the aux
        # input-reconstruction head is a training feature and training
        # always uses one fixed input size (data/image_text.py)
        clean_gather=(_a(clean_gather) if clean_gather
                      else np.zeros((0, n_region or n_out), np.int32)),
        noisy_frame_row=_a(nf_row),
        noisy_frame_block=np.zeros((B,), np.int32),
        noisy_video_frame=np.zeros((B,), np.int32),
        clean_frame_row=_a(cf_row), clean_video_frame=_a(cf_vid),
        n_img=n_out, seg_len=n_out + 1, specs=(),
    )


IMG_TAG = re.compile(r"<\|image_\d+\|>")


class ImageGenProcessor:
    """Prompt templating + tokenization (OmniGen/processor.py:57-101).

    ``tokenizer`` is any HF-style callable: tokenizer(text).input_ids. BOS id
    1 is stripped from chunk starts like the reference."""

    def __init__(self, tokenizer, max_image_size: int = 1024,
                 token_ids: Optional[TokenIds] = None):
        self.tokenizer = tokenizer
        self.max_image_size = max_image_size
        # derive <img>/</img>/<|diffusion|> ids from the real tokenizer when
        # possible; DEFAULT_TOKEN_IDS is a smoke-run assumption only
        self.token_ids = (token_ids if token_ids is not None
                          else TokenIds.from_tokenizer(tokenizer))

    def add_prefix_instruction(self, prompt: str) -> str:
        return (
            "<|user|>\nGenerate an image according to the following "
            f"instructions\n{prompt}<|end|>\n<|assistant|>\n<|diffusion|>")

    def preprocess_image(self, image) -> np.ndarray:
        from PIL import Image
        img = image if hasattr(image, "convert") else Image.open(image)
        img = crop_arr(img.convert("RGB"), self.max_image_size)
        a = np.asarray(img, np.float32) / 255.0
        return (a - 0.5) / 0.5

    def row(self, prompt: str, images: Optional[Sequence] = None,
            n_region: Optional[int] = None, add_prefix: bool = True
            ) -> Tuple[TextRow, List[np.ndarray]]:
        text = self.add_prefix_instruction(prompt) if add_prefix else prompt
        pixels = [self.preprocess_image(x) for x in (images or [])]
        chunks = [self.tokenizer(c).input_ids for c in IMG_TAG.split(text)]
        chunks = [c[1:] if c and c[0] == 1 else c for c in chunks]
        tags = [int(s.split("|")[1].split("_")[-1])
                for s in IMG_TAG.findall(text)]
        assert len(tags) == len(pixels), (len(tags), len(pixels))
        ids: List[int] = []
        regions: List[Tuple[int, int]] = []
        ordered: List[np.ndarray] = []
        for i, chunk in enumerate(chunks):
            ids.extend(chunk)
            if i < len(chunks) - 1:
                px = pixels[tags[i] - 1]
                n = px.shape[0] * px.shape[1] // 256
                if n_region is not None:
                    assert n == n_region, "input images must share one size"
                regions.append((len(ids), len(ids) + n))
                ids.extend([self.token_ids.slot] * n)
                ordered.append(px)
        return TextRow(ids, regions), ordered


@dataclasses.dataclass
class ImageGenPipeline:
    """Text(+image) -> image with 2/3-way CFG and KV-cached denoising."""

    model: VideoGPT
    params: dict
    vae: AutoencoderKL
    vae_params: dict
    processor: ImageGenProcessor

    def _run_fn(self, length, prefix, tail, n_rows, steps, time_shift,
                prediction_type, guidance_scale, img_guidance_scale):
        """Compiled prefill+scan program, cached per sequence signature (the
        video pipeline's _block_fn pattern — a fresh @jax.jit per call would
        retrace/recompile every generation)."""
        key = (length, prefix, tail, n_rows, steps, time_shift,
               prediction_type, guidance_scale, img_guidance_scale)
        cache_dict = self.__dict__.setdefault("_run_fns", {})
        if key in cache_dict:
            return cache_dict[key]
        sched = SchedulerConfig(num_steps=steps,
                                time_shifting_factor=time_shift,
                                prediction_type=prediction_type)
        model = self.model
        guidance = self._guidance(n_rows, guidance_scale, img_guidance_scale)

        @jax.jit
        def run(params, batch, clean, z0):
            cache = model.apply(params, batch, clean, prefix,
                                method=VideoGPT.prefill)
            from .models.video_gpt import maybe_bias
            bias = maybe_bias(model.cfg, batch.meta.tail(tail), batch.meta)

            def denoise(z, t):
                return model.apply(params, batch, z, t, cache, tail, bias,
                                   method=VideoGPT.decode)

            return sample(z0, denoise, sched, use_cfg=True,
                          cfg_scale=guidance_scale, guidance_fn=guidance)

        cache_dict[key] = run
        return run

    def _guidance(self, n_rows: int, cfg_scale: float, img_scale: float):
        def fn(pred):
            parts = jnp.split(pred, n_rows, axis=0)
            if n_rows == 3:
                cond, uncond, img_cond = parts
                out = (uncond + img_scale * (img_cond - uncond)
                       + cfg_scale * (cond - img_cond))
            else:
                cond, uncond = parts
                out = uncond + cfg_scale * (cond - uncond)
            return jnp.concatenate([out] * n_rows, axis=0)
        return fn

    def _combine(self, n_rows: int, cfg_scale: float, img_scale: float):
        """Mix per-context predictions (OmniGen/model.py:359-372):
        3-way = uncond + img_scale*(img_cond - uncond)
                       + cfg_scale*(cond - img_cond)."""
        def fn(preds):
            if n_rows == 3:
                cond, uncond, img_cond = preds
                return (uncond + img_scale * (img_cond - uncond)
                        + cfg_scale * (cond - img_cond))
            cond, uncond = preds
            return uncond + cfg_scale * (cond - uncond)
        return fn

    def _run_fn_separate(self, sig, steps, time_shift, prediction_type,
                         guidance_scale, img_guidance_scale,
                         cfg_interval=None, uncond_refresh=1):
        """Separate-CFG program (the reference default,
        OmniGen/pipeline.py:147,224-258): each guidance context prefillls
        and decodes at its NATURAL length — the shorter negative/image rows
        never pay attention over the cond row's pad tokens, and XLA can
        overlap the independent per-context programs (the video path's
        measured win, sampling/pipeline.py:_denoise_fn). ``sig`` is a
        tuple of per-row (length, prefix, tail)."""
        key = ("sep", sig, steps, time_shift, prediction_type,
               guidance_scale, img_guidance_scale, cfg_interval,
               uncond_refresh)
        cache_dict = self.__dict__.setdefault("_run_fns", {})
        if key in cache_dict:
            return cache_dict[key]
        sched = SchedulerConfig(num_steps=steps,
                                time_shifting_factor=time_shift,
                                prediction_type=prediction_type,
                                cfg_interval=cfg_interval,
                                uncond_refresh=uncond_refresh)
        model = self.model
        combine = self._combine(len(sig), guidance_scale,
                                img_guidance_scale)
        from .models.video_gpt import maybe_bias

        @jax.jit
        def run(params, batches, cleans, z0):
            fns = []
            for r, (batch, clean) in enumerate(zip(batches, cleans)):
                _, prefix, tail = sig[r]
                cache = model.apply(params, batch, clean, prefix,
                                    method=VideoGPT.prefill)
                bias = maybe_bias(model.cfg, batch.meta.tail(tail),
                                  batch.meta)

                def fn(z, t, batch=batch, cache=cache, tail=tail, bias=bias):
                    return model.apply(params, batch, z, t, cache, tail,
                                       bias, method=VideoGPT.decode)

                fns.append(fn)
            return sample_separate_multi(z0, fns, combine, sched)

        cache_dict[key] = run
        return run

    def __call__(
        self,
        prompt,
        input_images: Optional[Sequence] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.0,
        use_img_guidance: bool = True,
        img_guidance_scale: float = 1.6,
        max_input_image_size: int = 1024,
        negative_prompt: str = DEFAULT_NEGATIVE_PROMPT,
        use_input_image_size_as_output: bool = False,
        prediction_type: str = "v",
        time_shifting_factor: float = 1.0,
        seed: Optional[int] = None,
        output_type: str = "pil",
        separate_cfg_infer: bool = True,
        cfg_interval: Optional[Tuple[float, float]] = None,
        uncond_refresh: int = 1,
    ):
        if not isinstance(prompt, str):
            # prompt LIST parity (OmniGen/pipeline.py:138,205-206): under
            # the reference's default separate_cfg_infer=True each prompt's
            # CFG rows run separately; outputs concatenate in prompt order.
            # Per-prompt keys derive from the base seed, like a loop of
            # single calls with seed, seed+1, ...  input_images for a
            # prompt list is a List[List[str]] — one inner list per prompt
            # (OmniGen/pipeline.py:139,161-162).
            if input_images is not None:
                if len(input_images) != len(prompt) or not all(
                        im is None or isinstance(im, (list, tuple))
                        for im in input_images):
                    raise ValueError(
                        "with a prompt list, input_images must be a list of "
                        "per-prompt image lists of the same length "
                        "(OmniGen/pipeline.py:139)")
            base = 0 if seed is None else seed
            out: List = []
            for i, p_ in enumerate(prompt):
                imgs_i = None if input_images is None else input_images[i]
                out.extend(self(
                    p_, imgs_i, height, width, num_inference_steps,
                    guidance_scale, use_img_guidance, img_guidance_scale,
                    max_input_image_size, negative_prompt,
                    use_input_image_size_as_output, prediction_type,
                    time_shifting_factor, base + i, output_type,
                    separate_cfg_infer, cfg_interval, uncond_refresh))
            return out
        proc = self.processor
        proc.max_image_size = max_input_image_size
        if not input_images:
            use_img_guidance = False
        rows: List[TextRow] = []
        cond_row, pixels = proc.row(prompt, input_images)
        rows.append(cond_row)
        neg_row, _ = proc.row(negative_prompt, None)
        rows.append(neg_row)
        if use_img_guidance:
            img_prompt = " ".join(
                f"<img><|image_{i+1}|></img>"
                for i in range(len(input_images)))
            img_row, _ = proc.row(img_prompt, input_images)
            rows.append(img_row)
        n_rows = len(rows)

        if use_input_image_size_as_output:
            if not pixels:
                raise ValueError(
                    "use_input_image_size_as_output=True requires at least "
                    "one input image (LVM/pipeline.py:405-407 semantics)")
            height, width = pixels[0].shape[:2]
        f = self.vae.cfg.downsample_factor
        p = self.model.cfg.patch_size
        hl, wl = height // f, width // f
        n_out = (hl // p) * (wl // p)
        # uniform input sizes keep the rectangular clean_gather / batched
        # encode; mixed sizes are first-class (each region at its own token
        # length, OmniGen/processor.py:63-91,215-233)
        uniform = len({px.shape for px in pixels}) <= 1
        n_region = (pixels[0].shape[0] * pixels[0].shape[1] // 256
                    if pixels and uniform else None)
        dtype = self.model.dtype

        rng = jax.random.PRNGKey(0 if seed is None else seed)
        rng, erng, zrng = jax.random.split(rng, 3)
        if pixels and uniform:
            px = jnp.asarray(np.stack(pixels), dtype)
            clean_c = self.vae.apply(self.vae_params, px, erng,
                                     method=AutoencoderKL.encode)
            groups = (clean_c,)
        elif pixels:
            keys = jax.random.split(erng, len(pixels))
            groups = tuple(
                self.vae.apply(self.vae_params,
                               jnp.asarray(im[None], dtype), k,
                               method=AutoencoderKL.encode)
                for im, k in zip(pixels, keys))
        else:
            groups = ()
        z0 = jax.random.normal(zrng, (1, hl, wl,
                                      self.model.cfg.in_channels), dtype)

        if separate_cfg_infer:
            # each guidance context at its natural length (reference
            # default, OmniGen/pipeline.py:147)
            layouts = [single_shot_layout([r], n_out, n_region)
                       for r in rows]
            batches = [Batch.from_layout(l) for l in layouts]
            sig = tuple((l.length, l.length - l.noisy_tail_len(),
                         l.noisy_tail_len()) for l in layouts)
            empty = (jnp.zeros((0, hl, wl, self.model.cfg.in_channels),
                               dtype),)
            cleans = [groups if r.image_regions else empty for r in rows]
            run = self._run_fn_separate(sig, num_inference_steps,
                                        time_shifting_factor,
                                        prediction_type, guidance_scale,
                                        img_guidance_scale, cfg_interval,
                                        uncond_refresh)
            latents = run(self.params, batches, cleans, z0)
        else:
            if cfg_interval is not None or uncond_refresh != 1:
                # the padded batch evaluates every context in ONE forward:
                # skipping a context's evaluation is structurally impossible
                raise ValueError(
                    "cfg_interval/uncond_refresh serving schedules need "
                    "separate_cfg_infer=True (the default)")
            layout = single_shot_layout(rows, n_out, n_region)
            batch = Batch.from_layout(layout)
            tail = layout.noisy_tail_len()
            prefix = layout.length - tail
            # cond row's regions first, then (img guidance) the img row's
            # copies — the (row, region) order clean_src indexes
            clean = (groups + groups if use_img_guidance else groups)
            if not clean:
                clean = (jnp.zeros((0, hl, wl,
                                    self.model.cfg.in_channels), dtype),)
            z0b = jnp.concatenate([z0] * n_rows, axis=0)
            run = self._run_fn(layout.length, prefix, tail, n_rows,
                               num_inference_steps, time_shifting_factor,
                               prediction_type, guidance_scale,
                               img_guidance_scale)
            latents = run(self.params, batch, clean, z0b)[:1]
        out = self.vae.apply(self.vae_params, latents,
                             method=AutoencoderKL.decode)
        if output_type == "pt":
            # tensor output (OmniGen/pipeline.py:307-308): pixels in [0, 1].
            # NHWC float32 numpy here — the framework's layout — vs the
            # reference's NCHW torch tensor.
            x = np.asarray(out, np.float32)
            return np.clip(x * 0.5 + 0.5, 0.0, 1.0)
        return postprocess_frames(np.asarray(out, np.float32))
