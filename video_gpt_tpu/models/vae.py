"""SDXL-class convolutional VAE (AutoencoderKL) in Flax, NHWC.

The reference treats the VAE as an external dependency
(``stabilityai/sdxl-vae`` via diffusers; LVM/pipeline.py:87-93) with
per-frame CUDA conv kernels. Here it is a first-class Flax module: frames are
batched through the encoder/decoder in one jitted call (the reference
encodes frame-by-frame in a Python loop, LVM/pipeline.py:491-498), NHWC
layout keeps XLA's conv tiling MXU-friendly, and weights import from the
diffusers checkpoint format (see ``vae_params_from_diffusers``).

Architecture (SD/SDXL AutoencoderKL): 4 down blocks (2 resnets each) with
/2 stride convs, mid block with single-head attention, symmetric decoder with
3-resnet up blocks and nearest-neighbour upsampling; GroupNorm(32) + SiLU
throughout; 4 latent channels, 8x spatial reduction.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    # sdxl-vae config.json: scaling_factor 0.13025, no shift
    scaling_factor: float = 0.13025
    shift_factor: Optional[float] = None

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def tiny(cls) -> "VAEConfig":
        # keeps the real /8 spatial factor with tiny widths
        return cls(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                   norm_num_groups=4)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over HW tokens (VAE mid block)."""

    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out")(y)
        return x + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, g, self.dtype,
                                name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers pads asymmetrically ((0,1),(0,1)) before the
                # stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_conv")(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(ch, g, self.dtype, name="mid_res_0")(h)
        h = AttnBlock(g, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, g, self.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(g, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                       name="quant_conv")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(h)
        h = ResnetBlock(ch, g, self.dtype, name="mid_res_0")(h)
        h = AttnBlock(g, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, g, self.dtype, name="mid_res_1")(h)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, g, self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_conv")(h)
        h = nn.GroupNorm(g, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)

    def encode_moments(self, pixels: jax.Array) -> jax.Array:
        """[N, H, W, 3] in [-1, 1] -> [N, H/8, W/8, 2*Cz] (mean ‖ logvar)."""
        return self.encoder(pixels)

    def encode(self, pixels: jax.Array, rng: Optional[jax.Array] = None,
               sample: bool = True) -> jax.Array:
        """Posterior sample (or mode), scaled for the diffusion model
        (LVM/pipeline.py:110-117 semantics)."""
        moments = self.encoder(pixels)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if sample:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        if self.cfg.shift_factor is not None:
            return (mean - self.cfg.shift_factor) * self.cfg.scaling_factor
        return mean * self.cfg.scaling_factor

    def decode(self, latents: jax.Array) -> jax.Array:
        """Scaled latents -> pixels in [-1, 1]."""
        z = latents / self.cfg.scaling_factor
        if self.cfg.shift_factor is not None:
            z = z + self.cfg.shift_factor
        return self.decoder(z)

    def __call__(self, pixels, rng=None, sample=False):
        return self.decode(self.encode(pixels, rng, sample))


def vae_params_from_diffusers(sd, cfg: VAEConfig = VAEConfig()):
    """Map a diffusers AutoencoderKL state_dict (numpy values) onto this
    module's param tree. Torch conv weights [O, I, kh, kw] -> flax
    [kh, kw, I, O]; attention to_* are 1x1 convs in old checkpoints or
    linears in new ones — both collapse to Dense kernels."""

    def conv(name):
        w = sd[name + ".weight"]
        return {"kernel": w.transpose(2, 3, 1, 0), "bias": sd[name + ".bias"]}

    def dense(name):
        w = sd[name + ".weight"]
        if w.ndim == 4:  # 1x1 conv form
            w = w[:, :, 0, 0]
        return {"kernel": w.T, "bias": sd[name + ".bias"]}

    def norm(name):
        return {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}

    def resnet(dst, src):
        out = {"norm1": norm(src + ".norm1"), "conv1": conv(src + ".conv1"),
               "norm2": norm(src + ".norm2"), "conv2": conv(src + ".conv2")}
        if src + ".conv_shortcut.weight" in sd:
            out["conv_shortcut"] = conv(src + ".conv_shortcut")
        return out

    def attn(src):
        proj = (src + ".to_out.0" if src + ".to_out.0.weight" in sd
                else src + ".proj_attn")
        names = {"to_q": "to_q" if src + ".to_q.weight" in sd else "query",
                 "to_k": "to_k" if src + ".to_k.weight" in sd else "key",
                 "to_v": "to_v" if src + ".to_v.weight" in sd else "value"}
        return {"group_norm": norm(src + ".group_norm"),
                "to_q": dense(f"{src}.{names['to_q']}"),
                "to_k": dense(f"{src}.{names['to_k']}"),
                "to_v": dense(f"{src}.{names['to_v']}"),
                "to_out": dense(proj)}

    n_blocks = len(cfg.block_out_channels)
    enc = {"conv_in": conv("encoder.conv_in"),
           "conv_norm_out": norm("encoder.conv_norm_out"),
           "conv_out": conv("encoder.conv_out"),
           "quant_conv": conv("quant_conv"),
           "mid_res_0": resnet("mid_res_0", "encoder.mid_block.resnets.0"),
           "mid_attn": attn("encoder.mid_block.attentions.0"),
           "mid_res_1": resnet("mid_res_1", "encoder.mid_block.resnets.1")}
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_res_{j}"] = resnet(
                None, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            enc[f"down_{i}_conv"] = conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv")
    dec = {"post_quant_conv": conv("post_quant_conv"),
           "conv_in": conv("decoder.conv_in"),
           "conv_norm_out": norm("decoder.conv_norm_out"),
           "conv_out": conv("decoder.conv_out"),
           "mid_res_0": resnet(None, "decoder.mid_block.resnets.0"),
           "mid_attn": attn("decoder.mid_block.attentions.0"),
           "mid_res_1": resnet(None, "decoder.mid_block.resnets.1")}
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = resnet(
                None, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            dec[f"up_{i}_conv"] = conv(
                f"decoder.up_blocks.{i}.upsamplers.0.conv")
    return {"encoder": enc, "decoder": dec}
