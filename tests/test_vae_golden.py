"""Flax AutoencoderKL + diffusers importer vs a functional-torch oracle.

The oracle implements the diffusers AutoencoderKL forward (resnets,
single-head mid attention, asymmetric-pad stride-2 downsamplers, nearest
upsamplers — the SDXL-VAE the reference loads, LVM/pipeline.py:87-93)
directly from a synthetic state_dict in diffusers naming, so the test
pins BOTH the architecture and every transposition in
``vae_params_from_diffusers`` without needing diffusers installed.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from video_gpt_tpu.models.vae import (AutoencoderKL, VAEConfig,  # noqa: E402
                                      vae_params_from_diffusers)

pytestmark = pytest.mark.slow

CFG = VAEConfig.tiny()  # (8, 8, 16, 16), 1 layer/block, groups=4


def _mk(gen, *shape):
    return torch.randn(*shape, generator=gen) * 0.2


def _make_sd(cfg: VAEConfig, style: str):
    """Synthetic diffusers AutoencoderKL state_dict (torch tensors)."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = _mk(g, cout, cin, k, k)
        sd[f"{name}.bias"] = _mk(g, cout)

    def norm(name, ch):
        sd[f"{name}.weight"] = 1.0 + _mk(g, ch)
        sd[f"{name}.bias"] = _mk(g, ch)

    def resnet(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cin, cout, k=1)

    def attn(name, ch):
        norm(f"{name}.group_norm", ch)
        if style == "new":  # Linear to_q/to_k/to_v/to_out.0
            for p in ("to_q", "to_k", "to_v", "to_out.0"):
                sd[f"{name}.{p}.weight"] = _mk(g, ch, ch)
                sd[f"{name}.{p}.bias"] = _mk(g, ch)
        else:               # 1x1-conv query/key/value/proj_attn
            for p in ("query", "key", "value", "proj_attn"):
                sd[f"{name}.{p}.weight"] = _mk(g, ch, ch, 1, 1)
                sd[f"{name}.{p}.bias"] = _mk(g, ch)

    boc = cfg.block_out_channels
    nb = len(boc)
    conv("encoder.conv_in", cfg.in_channels, boc[0])
    ch = boc[0]
    for i in range(nb):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ch, boc[i])
            ch = boc[i]
        if i < nb - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    resnet("encoder.mid_block.resnets.0", ch, ch)
    attn("encoder.mid_block.attentions.0", ch)
    resnet("encoder.mid_block.resnets.1", ch, ch)
    norm("encoder.conv_norm_out", ch)
    conv("encoder.conv_out", ch, 2 * cfg.latent_channels)
    conv("quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1)

    conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, k=1)
    rev = list(reversed(boc))
    conv("decoder.conv_in", cfg.latent_channels, rev[0])
    ch = rev[0]
    resnet("decoder.mid_block.resnets.0", ch, ch)
    attn("decoder.mid_block.attentions.0", ch)
    resnet("decoder.mid_block.resnets.1", ch, ch)
    for i in range(nb):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ch, rev[i])
            ch = rev[i]
        if i < nb - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    norm("decoder.conv_norm_out", ch)
    conv("decoder.conv_out", ch, cfg.out_channels)
    return sd


# ---- functional torch oracle (diffusers semantics, NCHW) -------------------

def t_conv(sd, name, x, stride=1, padding=1):
    return F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"],
                    stride=stride, padding=padding)


def t_norm(sd, name, x, groups):
    return F.group_norm(x, groups, sd[f"{name}.weight"], sd[f"{name}.bias"],
                        eps=1e-6)


def t_resnet(sd, p, x, groups):
    h = t_conv(sd, f"{p}.conv1", F.silu(t_norm(sd, f"{p}.norm1", x, groups)))
    h = t_conv(sd, f"{p}.conv2", F.silu(t_norm(sd, f"{p}.norm2", h, groups)))
    if f"{p}.conv_shortcut.weight" in sd:
        x = F.conv2d(x, sd[f"{p}.conv_shortcut.weight"],
                     sd[f"{p}.conv_shortcut.bias"])
    return x + h


def t_attn(sd, p, x, groups, style):
    y = t_norm(sd, f"{p}.group_norm", x, groups)
    b, c, hh, ww = y.shape
    y = y.reshape(b, c, hh * ww).permute(0, 2, 1)

    def proj(name, t):
        w, bb = sd[f"{p}.{name}.weight"], sd[f"{p}.{name}.bias"]
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return t @ w.T + bb

    names = (("to_q", "to_k", "to_v", "to_out.0") if style == "new"
             else ("query", "key", "value", "proj_attn"))
    q, k, v = proj(names[0], y), proj(names[1], y), proj(names[2], y)
    w_ = torch.softmax(q @ k.transpose(1, 2) * (c ** -0.5), dim=-1)
    y = proj(names[3], w_ @ v)
    return x + y.permute(0, 2, 1).reshape(b, c, hh, ww)


def t_encode(sd, cfg, x, style):
    g = cfg.norm_num_groups
    boc = cfg.block_out_channels
    h = t_conv(sd, "encoder.conv_in", x)
    for i in range(len(boc)):
        for j in range(cfg.layers_per_block):
            h = t_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", h, g)
        if i < len(boc) - 1:
            h = F.pad(h, (0, 1, 0, 1))
            h = t_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                       h, stride=2, padding=0)
    h = t_resnet(sd, "encoder.mid_block.resnets.0", h, g)
    h = t_attn(sd, "encoder.mid_block.attentions.0", h, g, style)
    h = t_resnet(sd, "encoder.mid_block.resnets.1", h, g)
    h = F.silu(t_norm(sd, "encoder.conv_norm_out", h, g))
    h = t_conv(sd, "encoder.conv_out", h)
    return F.conv2d(h, sd["quant_conv.weight"], sd["quant_conv.bias"])


def t_decode(sd, cfg, z, style):
    g = cfg.norm_num_groups
    boc = cfg.block_out_channels
    h = F.conv2d(z, sd["post_quant_conv.weight"], sd["post_quant_conv.bias"])
    h = t_conv(sd, "decoder.conv_in", h)
    h = t_resnet(sd, "decoder.mid_block.resnets.0", h, g)
    h = t_attn(sd, "decoder.mid_block.attentions.0", h, g, style)
    h = t_resnet(sd, "decoder.mid_block.resnets.1", h, g)
    for i in range(len(boc)):
        for j in range(cfg.layers_per_block + 1):
            h = t_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", h, g)
        if i < len(boc) - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = t_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", h)
    h = F.silu(t_norm(sd, "decoder.conv_norm_out", h, g))
    return t_conv(sd, "decoder.conv_out", h)


@pytest.mark.parametrize("style", ["new", "old"])
def test_vae_encoder_matches_torch_oracle(style):
    sd = _make_sd(CFG, style)
    x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(1))
    want = t_encode(sd, CFG, x, style).detach().numpy()

    params = {"params": vae_params_from_diffusers(
        {k: v.numpy() for k, v in sd.items()}, CFG)}
    vae = AutoencoderKL(CFG)
    got = vae.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    method=AutoencoderKL.encode_moments)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("style", ["new", "old"])
def test_vae_decoder_matches_torch_oracle(style):
    sd = _make_sd(CFG, style)
    z = torch.randn(2, 4, 4, 4, generator=torch.Generator().manual_seed(2))
    want = t_decode(sd, CFG, z, style).detach().numpy()

    params = {"params": vae_params_from_diffusers(
        {k: v.numpy() for k, v in sd.items()}, CFG)}
    vae = AutoencoderKL(CFG)
    # decode() undoes the scaling the diffusion model uses; pre-scale so the
    # decoder sees exactly z (LVM/pipeline.py:110-117 semantics)
    scaled = jnp.asarray(z.numpy().transpose(0, 2, 3, 1)) * CFG.scaling_factor
    got = vae.apply(params, scaled, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-4)


def test_vae_encode_mode_statistics():
    """encode(sample=False) returns scaled posterior mean; sampling adds
    noise with the posterior std (seeded, deterministic)."""
    sd = _make_sd(CFG, "new")
    params = {"params": vae_params_from_diffusers(
        {k: v.numpy() for k, v in sd.items()}, CFG)}
    vae = AutoencoderKL(CFG)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 32, 32, 3), jnp.float32)
    mode = vae.apply(params, x, None, False, method=AutoencoderKL.encode)
    moments = vae.apply(params, x, method=AutoencoderKL.encode_moments)
    mean = np.asarray(moments)[..., :4] * CFG.scaling_factor
    np.testing.assert_allclose(np.asarray(mode), mean, atol=1e-6)
    s1 = vae.apply(params, x, jax.random.PRNGKey(0), True,
                   method=AutoencoderKL.encode)
    s2 = vae.apply(params, x, jax.random.PRNGKey(0), True,
                   method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=0)
    assert np.abs(np.asarray(s1) - np.asarray(mode)).max() > 1e-6
