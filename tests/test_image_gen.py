"""Single-shot image-generation layout + pipeline (OmniGen ancestor family).

Masks/positions golden-tested against the reference collator's
process_mllm_input path (LVM/processor.py:841-866 == OmniGen's), then the
pipeline is smoke-run end-to-end with a stub tokenizer.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import ModelConfig
from video_gpt_tpu.image_gen import (ImageGenPipeline, ImageGenProcessor,
                                     TextRow, single_shot_layout)
from video_gpt_tpu.layout import render_dense_mask
from video_gpt_tpu.models.vae import AutoencoderKL, VAEConfig
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.tokens import DEFAULT_TOKEN_IDS as IDS

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")


def test_single_shot_layout_matches_reference(ref):
    # rows: cond (text + one 4-token image region), neg (text only)
    n_region, n_out = 4, 16  # 32x32 region, 64x64 output
    cond_ids = [11, 12, 13] + [0] * n_region + [14, 15]
    cond_sizes = [[3, 3 + n_region]]
    neg_ids = [21, 22, 23, 24, 25, 26, 27]
    inputs = [
        {"input_ids": cond_ids, "pixel_values": [torch.zeros(1, 3, 32, 32)],
         "image_sizes": cond_sizes},
        {"input_ids": neg_ids, "pixel_values": None, "image_sizes": None},
    ]
    coll = ref.Collator(pad_token_id=IDS.pad, sequence_parallel_size=1)
    (pad_ids, pos_ids, mask, _padding, _pv, img_sizes
     ) = coll.process_mllm_input(inputs, [[64, 64], [64, 64]])
    mask = coll.adjust_attention_for_input_images(mask, img_sizes)

    rows = [TextRow(cond_ids, [(3, 3 + n_region)]), TextRow(neg_ids, [])]
    layout = single_shot_layout(rows, n_out=n_out, n_region=n_region)

    # the reference's input_ids stop at the text prefix; TIME+output tokens
    # are embedding-concatenated in its model (LVM/model.py:360)
    prefix = layout.length - (n_out + 1)
    np.testing.assert_array_equal(layout.input_ids[:, :prefix],
                                  pad_ids.numpy())
    np.testing.assert_array_equal(layout.pos_ids, pos_ids.numpy())
    np.testing.assert_array_equal(render_dense_mask(layout),
                                  mask.numpy().astype(bool))
    assert layout.noisy_tail_len() == n_out + 1


class StubTokenizer:
    """Deterministic word-hash tokenizer for tests (BOS id 1 included to
    exercise the strip path)."""

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        ids = [1] + [100 + (hash(w) % 1000) for w in text.split()]
        return self._Out(ids)


def test_image_gen_pipeline_smoke():
    from PIL import Image
    cfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=192)
    vae_cfg = VAEConfig.tiny()
    model = VideoGPT(cfg, dtype=jnp.float32)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.float32)
    proc = ImageGenProcessor(StubTokenizer(), max_image_size=64)

    # init params on a representative single-shot layout
    row, _ = proc.row("a cat <img><|image_1|></img>",
                      [Image.new("RGB", (64, 64))])
    n = 16
    layout = single_shot_layout([row, row], n_out=n, n_region=n)
    z = jnp.zeros((2, 8, 8, 4))
    cl = jnp.zeros((1, 8, 8, 4))
    params = model.init(jax.random.PRNGKey(0), Batch.from_layout(layout), z,
                        jnp.zeros((2,)), cl)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                       jax.random.PRNGKey(2), True)

    pipe = ImageGenPipeline(model=model, params=params, vae=vae,
                            vae_params=vparams, processor=proc)
    # 3-way CFG (text + image guidance)
    out = pipe("a cat <img><|image_1|></img>",
               input_images=[Image.new("RGB", (64, 64), (128, 30, 200))],
               height=64, width=64, num_inference_steps=3,
               guidance_scale=2.0, img_guidance_scale=1.5,
               max_input_image_size=64, seed=0)
    assert len(out) == 1 and out[0].size == (64, 64)
    # 2-way CFG (no input image)
    out2 = pipe("a dog", input_images=None, height=64, width=64,
                num_inference_steps=2, guidance_scale=2.5, seed=0)
    assert len(out2) == 1 and out2[0].size == (64, 64)

    # output_type="pt" (OmniGen/pipeline.py:307): same pixels pre-uint8,
    # [0,1] float NHWC instead of PIL
    pt = pipe("a dog", input_images=None, height=64, width=64,
              num_inference_steps=2, guidance_scale=2.5, seed=0,
              output_type="pt")
    assert pt.shape == (1, 64, 64, 3) and pt.dtype == np.float32
    assert float(pt.min()) >= 0.0 and float(pt.max()) <= 1.0
    assert np.array_equal((pt[0] * 255).astype(np.uint8),
                          np.asarray(out2[0]))

    # prompt-LIST parity (OmniGen/pipeline.py:138): per-prompt separate-CFG
    # evaluation, outputs concatenated in prompt order; element i matches a
    # single call with seed base+i
    outs = pipe(["a dog", "a bird"], input_images=None, height=64, width=64,
                num_inference_steps=2, guidance_scale=2.5, seed=0)
    assert len(outs) == 2
    assert np.array_equal(np.asarray(outs[0]), np.asarray(out2[0]))
    solo1 = pipe("a bird", input_images=None, height=64, width=64,
                 num_inference_steps=2, guidance_scale=2.5, seed=1)
    assert np.array_equal(np.asarray(outs[1]), np.asarray(solo1[0]))

    # prompt list + per-prompt image lists (OmniGen/pipeline.py:139,161-162:
    # input_images is List[List] — prompt i pairs with input_images[i])
    img = Image.new("RGB", (64, 64), (128, 30, 200))
    pair = pipe(["a cat <img><|image_1|></img>", "a dog"],
                input_images=[[img], None], height=64, width=64,
                num_inference_steps=2, guidance_scale=2.0,
                img_guidance_scale=1.5, max_input_image_size=64, seed=0)
    assert len(pair) == 2
    solo_img = pipe("a cat <img><|image_1|></img>", input_images=[img],
                    height=64, width=64, num_inference_steps=2,
                    guidance_scale=2.0, img_guidance_scale=1.5,
                    max_input_image_size=64, seed=0)
    assert np.array_equal(np.asarray(pair[0]), np.asarray(solo_img[0]))
    # a flat (non-nested) input_images with a prompt list is rejected
    # rather than silently conditioning every prompt on all images
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pipe(["a", "b"], input_images=["x.png"], height=64, width=64,
             num_inference_steps=1)


def test_single_shot_layout_heterogeneous_regions_match_reference(ref):
    """Two input images of DIFFERENT sizes in one prompt: each region takes
    its own token length (OmniGen/processor.py:63-91,215-233). Golden mask/
    positions/ids vs the reference collator (VERDICT r3 ask #6)."""
    n_a, n_b, n_out = 4, 16, 16  # 32x32 and 64x64 inputs, 64x64 output
    cond_ids = ([11, 12] + [0] * n_a + [13] + [0] * n_b + [14])
    regions = [(2, 2 + n_a), (2 + n_a + 1, 2 + n_a + 1 + n_b)]
    neg_ids = [21, 22, 23]
    inputs = [
        {"input_ids": cond_ids,
         "pixel_values": [torch.zeros(1, 3, 32, 32),
                          torch.zeros(1, 3, 64, 64)],
         "image_sizes": [list(r) for r in regions]},
        {"input_ids": neg_ids, "pixel_values": None, "image_sizes": None},
    ]
    coll = ref.Collator(pad_token_id=IDS.pad, sequence_parallel_size=1)
    (pad_ids, pos_ids, mask, _padding, _pv, img_sizes
     ) = coll.process_mllm_input(inputs, [[64, 64], [64, 64]])
    mask = coll.adjust_attention_for_input_images(mask, img_sizes)

    rows = [TextRow(cond_ids, regions), TextRow(neg_ids, [])]
    layout = single_shot_layout(rows, n_out=n_out)  # sizes from the rows
    prefix = layout.length - (n_out + 1)
    np.testing.assert_array_equal(layout.input_ids[:, :prefix],
                                  pad_ids.numpy())
    np.testing.assert_array_equal(layout.pos_ids, pos_ids.numpy())
    np.testing.assert_array_equal(render_dense_mask(layout),
                                  mask.numpy().astype(bool))
    # clean_src walks the flat patch stream region-by-region
    srcs = layout.clean_src[0][layout.clean_src[0] >= 0]
    np.testing.assert_array_equal(srcs, np.arange(n_a + n_b))


def _tiny_pipe():
    """Tiny pipeline with PERTURBED params: the head is zero-init at
    model.init (reference parity), which would make every prediction
    exactly 0 and every schedule/path comparison trivially pass."""
    cfg = ModelConfig.tiny(attn_impl="reference", pos_embed_max_size=192)
    model = VideoGPT(cfg, dtype=jnp.float32)
    vae = AutoencoderKL(VAEConfig.tiny(), dtype=jnp.float32)
    proc = ImageGenProcessor(StubTokenizer(), max_image_size=64)
    from PIL import Image
    row, _ = proc.row("a cat <img><|image_1|></img>",
                      [Image.new("RGB", (64, 64))])
    layout = single_shot_layout([row, row], n_out=16, n_region=16)
    z = jnp.zeros((2, 8, 8, 4))
    cl = jnp.zeros((1, 8, 8, 4))
    params = model.init(jax.random.PRNGKey(0), Batch.from_layout(layout), z,
                        jnp.zeros((2,)), cl)
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(11), len(leaves))
    params = jax.tree.unflatten(treedef, [
        l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
        for l, r in zip(leaves, rngs)])
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                       jax.random.PRNGKey(2), True)
    return ImageGenPipeline(model=model, params=params, vae=vae,
                            vae_params=vparams, processor=proc)


def test_separate_cfg_matches_padded_batch():
    """separate_cfg_infer=True (the default; OmniGen/pipeline.py:147)
    equals the padded 2/3-row batch numerically — the guidance contexts
    just run at their natural lengths (VERDICT r3 ask #5)."""
    from PIL import Image
    pipe = _tiny_pipe()
    img = Image.new("RGB", (64, 64), (128, 30, 200))

    # 3-way CFG (text + image guidance)
    kw = dict(input_images=[img], height=64, width=64,
              num_inference_steps=3, guidance_scale=2.0,
              img_guidance_scale=1.5, max_input_image_size=64, seed=0,
              output_type="pt")
    sep = pipe("a cat <img><|image_1|></img>", separate_cfg_infer=True, **kw)
    pad = pipe("a cat <img><|image_1|></img>", separate_cfg_infer=False,
               **kw)
    assert float(np.std(sep)) > 1e-4  # non-degenerate comparison
    np.testing.assert_allclose(sep, pad, atol=2e-5, rtol=2e-5)

    # 2-way CFG (text only)
    kw2 = dict(height=64, width=64, num_inference_steps=2,
               guidance_scale=2.5, seed=0, output_type="pt")
    sep2 = pipe("a dog", separate_cfg_infer=True, **kw2)
    pad2 = pipe("a dog", separate_cfg_infer=False, **kw2)
    np.testing.assert_allclose(sep2, pad2, atol=2e-5, rtol=2e-5)


def test_pipeline_heterogeneous_input_sizes():
    """Mixed-size editing prompt end-to-end: a 64x64 and a 32x32 input in
    one prompt, 3-way CFG, both separate and padded paths."""
    from PIL import Image
    pipe = _tiny_pipe()
    imgs = [Image.new("RGB", (64, 64), (128, 30, 200)),
            Image.new("RGB", (32, 32), (20, 200, 90))]
    kw = dict(input_images=imgs, height=64, width=64,
              num_inference_steps=2, guidance_scale=2.0,
              img_guidance_scale=1.5, max_input_image_size=64, seed=3,
              output_type="pt")
    prompt = "blend <img><|image_1|></img> with <img><|image_2|></img>"
    sep = pipe(prompt, separate_cfg_infer=True, **kw)
    assert sep.shape == (1, 64, 64, 3)
    assert np.isfinite(sep).all()
    assert float(np.std(sep)) > 1e-4  # non-degenerate comparison
    pad = pipe(prompt, separate_cfg_infer=False, **kw)
    np.testing.assert_allclose(sep, pad, atol=2e-5, rtol=2e-5)


def test_image_serving_schedules_wired():
    """cfg_interval/uncond_refresh reach the image-gen separate-CFG
    sampler: defaults are bit-identical to the explicit k=1, a covering
    interval changes nothing, k=2 differs and stays finite, and the
    padded-batch path refuses the knobs instead of ignoring them."""
    pipe = _tiny_pipe()
    kw = dict(height=64, width=64, num_inference_steps=4,
              guidance_scale=2.5, seed=0, output_type="pt")
    base = pipe("a dog", **kw)
    k1 = pipe("a dog", uncond_refresh=1, **kw)
    np.testing.assert_array_equal(base, k1)
    cover = pipe("a dog", cfg_interval=(0.0, 2.0), **kw)
    np.testing.assert_array_equal(base, cover)
    k2 = pipe("a dog", uncond_refresh=2, **kw)
    assert np.isfinite(k2).all()
    assert not np.array_equal(base, k2)
    with pytest.raises(ValueError, match="separate_cfg_infer"):
        pipe("a dog", separate_cfg_infer=False, uncond_refresh=2, **kw)
