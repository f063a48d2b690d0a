"""Numerical parity of the JAX model stack against torch oracles.

- embedder/pos-embed math vs the reference's own modules (LVM/model.py)
- Phi-3 decoder trunk vs HF transformers Phi3Model (same weights, same
  frame-block mask rendered densely)
- full VideoGPT forward vs a torch re-composition of LVM.frame_block_forward
  driven by the reference collator's dicts (LVM/model.py:399-501)
- prefill+decode KV-cache path vs the full-sequence forward
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import ModelConfig
from video_gpt_tpu.layout import (RowSpec, build_layout,
                                  frame_block_inference_layout,
                                  render_dense_mask, tokens_per_frame)
from video_gpt_tpu.models.embedders import (crop_pos_embed,
                                            sincos_2d_pos_embed,
                                            sincos_timestep_embedding)
from video_gpt_tpu.models.phi3 import Phi3Decoder
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.ops.attention import AttnMeta
from video_gpt_tpu.tokens import DEFAULT_TOKEN_IDS as IDS
from video_gpt_tpu.utils.torch_import import (decoder_params_from_torch,
                                              videogpt_params_from_torch)

torch = pytest.importorskip("torch")

TINY = ModelConfig.tiny(attn_impl="reference")


def _sd_numpy(module, prefix=""):
    return {prefix + k: v.detach().float().numpy()
            for k, v in module.state_dict().items()}


def _hf_model(cfg: ModelConfig):
    from transformers import Phi3Config
    from transformers.models.phi3.modeling_phi3 import Phi3Model
    hf_cfg = Phi3Config(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, vocab_size=cfg.vocab_size,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attn_implementation="eager")
    m = Phi3Model(hf_cfg)
    m.eval()
    return m


def _bias4d(mask_bool: "torch.Tensor", dtype=torch.float32):
    # 3D bool mask -> additive 4D bias (OmniGen/transformer.py:139-145)
    m = mask_bool.to(dtype)
    return ((1.0 - m) * torch.finfo(dtype).min).unsqueeze(1)


def test_timestep_embedding_matches_reference(ref_model_mod):
    t = np.array([0.0, 0.1, 0.5, 0.99, 1.0], np.float32)
    ref = ref_model_mod.TimestepEmbedder.timestep_embedding(
        torch.tensor(t), 256).numpy()
    mine = np.asarray(sincos_timestep_embedding(jnp.asarray(t), 256))
    np.testing.assert_allclose(mine, ref, atol=1e-5)  # ULP-level cos/exp
    # differences between XLA-CPU and torch transcendentals


def test_pos_embed_table_matches_reference(ref_model_mod):
    for dim, grid, interp in [(64, 16, 1.0), (32, 8, 2.0)]:
        ref = ref_model_mod.get_2d_sincos_pos_embed(
            dim, grid, interpolation_scale=interp, base_size=64)
        mine = sincos_2d_pos_embed(dim, grid, interpolation_scale=interp,
                                   base_size=64)
        np.testing.assert_allclose(mine, ref.astype(np.float32), atol=1e-6)


def test_cropped_pos_embed_matches_reference(ref_model_mod):
    """Center crop vs LVM.cropped_pos_embed (LVM/model.py:268-289), via a
    minimal object exposing the method's attributes."""
    table = ref_model_mod.get_2d_sincos_pos_embed(32, 8, base_size=64)

    class Holder:
        pos_embed_max_size = 8
        patch_size = 2
        pos_embed = torch.from_numpy(table).float().unsqueeze(0)

    ref = ref_model_mod.LVM.cropped_pos_embed(Holder(), 4, 8).numpy()[0]
    mine = crop_pos_embed(table.astype(np.float32), 8, 2, 4)
    np.testing.assert_allclose(mine, ref, atol=1e-6)


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_backbone_matches_hf_phi3(kv_heads):
    cfg = ModelConfig.tiny(num_kv_heads=kv_heads, attn_impl="reference")
    hf = _hf_model(cfg)
    layout = frame_block_inference_layout(2, 2, tokens_per_frame(32, 32),
                                          use_cfg=True)
    B, L = layout.batch, layout.length
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(B, L, cfg.hidden_size)).astype(np.float32)
    mask = torch.from_numpy(render_dense_mask(layout))
    with torch.no_grad():
        ref_out = hf(inputs_embeds=torch.from_numpy(emb),
                     attention_mask=_bias4d(mask),
                     position_ids=torch.from_numpy(layout.pos_ids).long(),
                     use_cache=False).last_hidden_state.numpy()

    dec = Phi3Decoder(cfg, dtype=jnp.float32)
    sd = _sd_numpy(hf)
    params = decoder_params_from_torch(sd, cfg, prefix="")
    meta = AttnMeta.from_layout(layout)
    out, _ = dec.apply({"params": params}, jnp.asarray(emb),
                       jnp.asarray(layout.pos_ids), meta, meta)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-4)


def _torch_oracle_forward(ref_model_mod, hf, mods, layout_dicts, z, t,
                          clean, t_cfg):
    """Re-compose LVM.frame_block_forward (LVM/model.py:399-501) in torch."""
    (pad_ids, pos_ids, mask, input_sizes, denoise_sizes, time_inx) = \
        layout_dicts
    x_emb, in_emb, time_tok_m, t_emb_m, final_m = mods
    table = ref_model_mod.get_2d_sincos_pos_embed(
        t_cfg.hidden_size, t_cfg.pos_embed_max_size, base_size=64)

    def pos_crop(hl, wl):
        p, ms = t_cfg.patch_size, t_cfg.pos_embed_max_size
        hp, wp = hl // p, wl // p
        top, left = (ms - hp) // 2, (ms - wp) // 2
        tt = table.reshape(ms, ms, -1)[top:top + hp, left:left + wp]
        return torch.from_numpy(tt.reshape(1, hp * wp, -1)).float()

    def patch(latents, embedder):
        outs = []
        for lat in latents:  # [1, C, hl, wl]
            e = embedder(lat)
            outs.append(e + pos_crop(lat.shape[-2], lat.shape[-1]))
        return outs

    with torch.no_grad():
        x_tok = patch(z, x_emb)
        c_tok = patch(clean, in_emb)
        time_tok = time_tok_m(t)
        emb = hf.embed_tokens(pad_ids)
        cnt = 0
        for b in input_sizes:
            for s, e in input_sizes[b]:
                emb[b, s:e] = c_tok[cnt][0]
                cnt += 1
        cnt = 0
        for b in time_inx:
            for i in time_inx[b]:
                emb[b, i] = time_tok[cnt]
                cnt += 1
        cnt = 0
        for b in denoise_sizes:
            for s, e in denoise_sizes[b]:
                emb[b, s:e] = x_tok[cnt][0]
                cnt += 1
        out = hf(inputs_embeds=emb, attention_mask=_bias4d(mask),
                 position_ids=pos_ids.long(),
                 use_cache=False).last_hidden_state
        t_emb = t_emb_m(t)
        preds = []
        cnt = 0
        for b in denoise_sizes:
            for s, e in denoise_sizes[b]:
                x = final_m(out[b:b + 1, s:e], t_emb[cnt:cnt + 1])
                hl, wl = z[cnt].shape[-2:]
                p, c = t_cfg.patch_size, t_cfg.in_channels
                x = x.reshape(1, hl // p, wl // p, p, p, c)
                x = torch.einsum("nhwpqc->nchpwq", x)
                preds.append(x.reshape(1, c, hl, wl))
                cnt += 1
    return preds


def test_full_model_parity(ref, ref_model_mod):
    torch.manual_seed(0)
    cfg = TINY
    h = w = 32  # pixels -> latent 4x4, 4 tokens/frame
    n = tokens_per_frame(h, w)
    n_clean, n_gen = 2, 2

    # layout via the reference collator (the oracle's own dicts)
    def ref_ids(frame_blocks):
        ids, sizes = [], []
        for k, fb in enumerate(frame_blocks):
            for _ in range(fb):
                if k != len(frame_blocks) - 1:
                    ids += [IDS.img_open]
                    sizes.append([len(ids), len(ids) + n])
                    ids += [IDS.slot] * n + [IDS.img_close]
                else:
                    ids += [IDS.diffusion, IDS.slot]
                    sizes.append([len(ids), len(ids) + n])
                    ids += [IDS.slot] * n
        return ids, sizes

    rows = [[n_clean, n_gen], [0, n_gen]]
    inputs = []
    for fb in rows:
        ids, sizes = ref_ids(fb)
        inputs.append({"input_ids": ids,
                       "pixel_values": [torch.zeros(1, 3, h, w)] * sum(fb),
                       "image_sizes": sizes, "frame_blocks": fb})
    coll = ref.Collator(pad_token_id=IDS.pad, sequence_parallel_size=1)
    (pad_ids, pos_ids, mask, _pv, all_sizes, fb_dict
     ) = coll.process_mllm_input_frame_block_inference(inputs)
    # split sizes into input/denoise/time dicts (LVM/processor.py:964-999)
    input_sizes, denoise_sizes, time_inx = {}, {}, {}
    for b in all_sizes:
        input_sizes[b], denoise_sizes[b], time_inx[b] = [], [], []
        idx = 0
        for k, fb in enumerate(fb_dict[b]):
            for _ in range(fb):
                if k != len(fb_dict[b]) - 1:
                    input_sizes[b].append(all_sizes[b][idx])
                else:
                    denoise_sizes[b].append(all_sizes[b][idx])
                    time_inx[b].append(all_sizes[b][idx][0] - 1)
                idx += 1

    # torch modules
    hf = _hf_model(cfg)
    x_emb = ref_model_mod.PatchEmbedMR(cfg.patch_size, cfg.in_channels,
                                       cfg.hidden_size)
    in_emb = ref_model_mod.PatchEmbedMR(cfg.patch_size, cfg.in_channels,
                                        cfg.hidden_size)
    time_tok = ref_model_mod.TimestepEmbedder(cfg.hidden_size)
    t_embd = ref_model_mod.TimestepEmbedder(cfg.hidden_size)
    final = ref_model_mod.FinalLayer(cfg.hidden_size, cfg.patch_size,
                                     cfg.in_channels)
    for m in (x_emb, in_emb, time_tok, t_embd, final):
        m.eval()

    # random data
    hl, wl = h // 8, w // 8
    Nn, Nc = 2 * n_gen, n_clean
    z = [torch.randn(1, 4, hl, wl) for _ in range(Nn)]
    clean = [torch.randn(1, 4, hl, wl) for _ in range(Nc)]
    t = torch.rand(Nn)

    ref_preds = _torch_oracle_forward(
        ref_model_mod, hf, (x_emb, in_emb, time_tok, t_embd, final),
        (pad_ids, pos_ids, mask, input_sizes, denoise_sizes, time_inx),
        z, t, clean, cfg)

    # my side: same weights via the importer
    sd = _sd_numpy(hf, prefix="llm.")
    sd.update(_sd_numpy(x_emb, prefix="x_embedder."))
    sd.update(_sd_numpy(in_emb, prefix="input_x_embedder."))
    sd.update(_sd_numpy(time_tok, prefix="time_token."))
    sd.update(_sd_numpy(t_embd, prefix="t_embedder."))
    sd.update(_sd_numpy(final, prefix="final_layer."))
    params = videogpt_params_from_torch(sd, cfg)

    layout = frame_block_inference_layout(n_clean, n_gen, n, use_cfg=True)
    np.testing.assert_array_equal(layout.input_ids, pad_ids.numpy())
    batch = Batch.from_layout(layout)
    model = VideoGPT(cfg, dtype=jnp.float32)
    z_j = jnp.asarray(torch.cat(z).permute(0, 2, 3, 1).numpy())
    c_j = jnp.asarray(torch.cat(clean).permute(0, 2, 3, 1).numpy())
    pred = model.apply({"params": params}, batch, z_j,
                       jnp.asarray(t.numpy()), c_j)

    ref_nhwc = torch.cat(ref_preds).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(pred), ref_nhwc,
                               atol=2e-4, rtol=1e-4)


def test_prefill_decode_matches_full():
    """KV-cache fast path == full forward (pure JAX self-consistency)."""
    cfg = TINY
    n = tokens_per_frame(32, 32)
    layout = frame_block_inference_layout(3, 2, n, use_cfg=True)
    batch = Batch.from_layout(layout)
    model = VideoGPT(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    Nn, Nc, hl, wl = 4, 3, 4, 4
    z = jax.random.normal(rng, (Nn, hl, wl, 4))
    clean = jax.random.normal(jax.random.PRNGKey(1), (Nc, hl, wl, 4))
    t = jnp.full((Nn,), 0.3)
    params = model.init(jax.random.PRNGKey(2), batch, z, t, clean)

    full = model.apply(params, batch, z, t, clean)

    tail = layout.noisy_tail_len()
    prefix = layout.length - tail
    cache = model.apply(params, batch, clean, prefix,
                        method=VideoGPT.prefill)
    fast = model.apply(params, batch, z, t, cache, tail,
                       method=VideoGPT.decode)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                               atol=1e-5, rtol=1e-5)
