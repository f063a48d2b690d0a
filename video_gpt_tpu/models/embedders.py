"""Embedders, positional tables, and the diffusion head.

TPU-native counterparts of LVM/model.py:22-154 (DiT-style components). The
patch embedder is a reshape+matmul rather than a Conv2d — a 2×2/stride-2 conv
is exactly a dense layer over flattened patches, and the matmul form maps
straight onto the MXU with no im2col. Latents are NHWC throughout.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sincos_timestep_embedding(t: jax.Array, dim: int,
                              max_period: float = 10000.0) -> jax.Array:
    """[N] -> [N, dim] sinusoidal features, cos first (LVM/model.py:39-58)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """Sinusoidal features + 2-layer SiLU MLP (LVM/model.py:26-63)."""

    hidden_size: int
    freq_embed_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        x = sincos_timestep_embedding(t, self.freq_embed_size)
        x = x.astype(self.dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1",
                     kernel_init=nn.initializers.normal(0.02))(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2",
                     kernel_init=nn.initializers.normal(0.02))(x)
        return x


def patchify(latents: jax.Array, patch: int) -> jax.Array:
    """[N, h, w, C] -> [N, (h/p)(w/p), p*p*C] with (ph, pw, c) minor order.

    The minor order matches a torch Conv2d(C, D, k=p, s=p) weight reshaped as
    (p, p, C, D), so reference checkpoints import losslessly.
    """
    n, h, w, c = latents.shape
    p = patch
    x = latents.reshape(n, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h/p, w/p, p, p, c
    return x.reshape(n, (h // p) * (w // p), p * p * c)


def unpatchify(x: jax.Array, h: int, w: int, patch: int, channels: int
               ) -> jax.Array:
    """[N, T, p*p*C] -> [N, h, w, C]; inverse of the reference's
    'nhwpqc->nchpwq' einsum (LVM/model.py:255-265), NHWC output."""
    n = x.shape[0]
    p = patch
    x = x.reshape(n, h // p, w // p, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h/p, p, w/p, p, c
    return x.reshape(n, h, w, channels)


class PatchEmbed(nn.Module):
    """Patchify + linear projection (LVM/model.py:138-154, PatchEmbedMR)."""

    hidden_size: int
    patch_size: int = 2
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False  # training variant zero-inits the noisy-patch
                             # embedder (LVM/model.py:639)

    @nn.compact
    def __call__(self, latents: jax.Array) -> jax.Array:
        x = patchify(latents, self.patch_size)
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.xavier_uniform())
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="proj",
                        kernel_init=init)(x)


def sincos_2d_pos_embed(dim: int, grid_size: int,
                        interpolation_scale: float = 1.0,
                        base_size: int = 64) -> np.ndarray:
    """[grid*grid, dim] table, numerically identical to LVM/model.py:86-135.

    Quirk preserved for checkpoint/latent parity: the first ``dim/2`` features
    encode the *column* coordinate and the second half the *row* coordinate
    (the reference's ``emb_h`` is fed grid[0] == the w meshgrid axis).
    """
    coords = (np.arange(grid_size, dtype=np.float32)
              / (grid_size / base_size) / interpolation_scale)

    def one_d(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000.0 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    rows = np.broadcast_to(coords[:, None], (grid_size, grid_size))
    cols = np.broadcast_to(coords[None, :], (grid_size, grid_size))
    emb = np.concatenate([one_d(dim // 2, cols), one_d(dim // 2, rows)],
                         axis=1)
    return emb.astype(np.float32)  # row-major (r, c) flattening


def crop_pos_embed(table: np.ndarray, grid_size: int, h_patches: int,
                   w_patches: int) -> np.ndarray:
    """Center-crop the square table to (h, w) patches and flatten
    (LVM/model.py:268-289)."""
    if h_patches > grid_size or w_patches > grid_size:
        raise ValueError(
            f"frame needs a {h_patches}x{w_patches} patch grid but "
            f"pos_embed_max_size is {grid_size} (LVM/model.py:275-282)")
    top = (grid_size - h_patches) // 2
    left = (grid_size - w_patches) // 2
    t = table.reshape(grid_size, grid_size, -1)
    t = t[top: top + h_patches, left: left + w_patches]
    return t.reshape(h_patches * w_patches, -1)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation; shift/scale are per-sample (LVM/model.py:22)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class FinalLayer(nn.Module):
    """adaLN-modulated linear head (LVM/model.py:66-83). Zero-initialised so a
    fresh model predicts zeros (LVM/model.py:240-244)."""

    patch_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        # x: [N, T, D] per-frame hidden states; c: [N, D] timestep embedding
        mod = nn.Dense(2 * x.shape[-1], dtype=self.dtype,
                       name="adaLN_modulation",
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros)(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="norm_final")(x)
        x = modulate(x, shift, scale)
        return nn.Dense(self.patch_size ** 2 * self.out_channels,
                        dtype=self.dtype, name="linear",
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(x)
