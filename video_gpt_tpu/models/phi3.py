"""Phi-3-style decoder backbone in Flax.

Functional re-design of the reference's HF-subclassed backbone
(OmniGen/transformer.py:35-232): RMSNorm, full-dim RoPE with explicit position
ids, fused qkv, SwiGLU MLP. Layers run under ``nn.scan`` (one compiled layer
body, stacked params) which keeps XLA compile time flat in depth; gradient
checkpointing is an ``nn.remat`` wrapper rather than the reference's
per-layer torch.utils.checkpoint calls (OmniGen/transformer.py:182-192).

The KV cache is an explicit pytree (k/v stacked over layers) instead of the
reference's mutable DynamicCache with CUDA-stream offload (LVM/scheduler.py:
12-115): prefill returns it, decode consumes it, everything stays jittable.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import AttnMeta, attend


class KVCache(NamedTuple):
    """Stacked per-layer keys/values, HEADS-MAJOR and LANE-PADDED:
    [num_layers, B, H_kv, L_ctx, round_up(D, 128)].

    This is byte-for-byte the layout every attention kernel reads, so the
    denoise scan consumes the cache with ZERO copies. Storing it any other
    way makes XLA materialise full-cache conversion copies outside the step
    loop (transposes for tokens-major, compress/uncompress pairs for an
    unpadded 96-lane minor dim — 2 x 2.4G HBM each at 80-frame windows: an
    OOM on one v5e). The D padding costs nothing physically: TPU HBM tiles
    the minor dim to 128 lanes either way."""

    k: jax.Array
    v: jax.Array

    @property
    def length(self) -> int:
        return self.k.shape[3]


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True)
                                + self.eps)
        # match HF ordering: normalise in fp32, cast back, then scale
        return xf.astype(self.dtype) * w.astype(self.dtype)


def rope_tables(pos_ids: jax.Array, head_dim: int, theta: float,
                dtype: jnp.dtype) -> Tuple[jax.Array, jax.Array]:
    """cos/sin [B, L, head_dim] for explicit (shared) position ids."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    freqs = pos_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, L, H, D]; cos/sin: [B, L, D] (rotate-half convention)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, :, None, :] + rotated * sin[:, :, None, :]


class LoraDense(nn.Module):
    """Bias-free Dense with an optional in-module LoRA path.

    ``rank > 0`` adds ``(alpha/rank) * (x@A) @ B`` with A/B as params in
    THIS module's scope — the tree shape ``training/lora.init_lora`` builds
    ({kernel, lora_a, lora_b}), so externally-initialised adapter trees
    graft directly. The adapters must act in-model: differentiating through
    an externally merged kernel makes the layer scan's backward accumulate
    stacked f32 kernel cotangents (~4.5G for qkv+o at 3.8B) before they
    contract to dA/dB; in-model, only the tiny adapter grads exist.
    ``rank == 0`` is param-for-param identical to ``nn.Dense(use_bias=False)``
    (same scope path -> same init stream; checkpoints are unaffected).
    """

    features: int
    rank: int = 0
    alpha: float = 8.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        y = x @ kernel.astype(self.dtype)
        if self.rank:
            a = self.param(
                "lora_a",
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                (x.shape[-1], self.rank))
            bm = self.param("lora_b", nn.initializers.zeros,
                            (self.rank, self.features))
            y = y + (x @ a.astype(self.dtype)) @ bm.astype(self.dtype) * (
                self.alpha / self.rank)
        return y


class Phi3Attention(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, q_meta, k_meta,
                 cache: Optional[Tuple[jax.Array, jax.Array]] = None,
                 bias: Optional[jax.Array] = None):
        cfg = self.cfg
        h, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        b, l, _ = x.shape
        qkv = LoraDense((h + 2 * hkv) * d, cfg.lora_rank, cfg.lora_alpha,
                        self.dtype, name="qkv_proj")(x)
        tp = cfg.tensor_parallel
        if tp > 1:
            # TP-grouped fused layout (ModelConfig.tensor_parallel): columns
            # are stored per-shard [q_i|k_i|v_i], so a block sharding of the
            # feature dim over 'tensor' is head-aligned. The tp-major merge
            # below restores the GLOBAL head order exactly.
            hq, hk = h // tp, hkv // tp
            qkv = qkv.reshape(b, l, tp, (hq + 2 * hk) * d)
            q, k, v = jnp.split(qkv, [hq * d, (hq + hk) * d], axis=-1)
        else:
            q, k, v = jnp.split(qkv, [h * d, (h + hkv) * d], axis=-1)
        q = q.reshape(b, l, h, d)
        k = k.reshape(b, l, hkv, d)
        v = v.reshape(b, l, hkv, d)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # new K/V emitted heads-major + lane-padded — the KVCache storage
        # layout (only the current tokens transpose/pad; the cache itself is
        # never relaid). Unused in training: DCE'd with the discarded cache.
        lane_pad = -d % 128
        new_kv = tuple(
            jnp.pad(x.transpose(0, 2, 1, 3),
                    ((0, 0), (0, 0), (0, 0), (0, lane_pad)))
            for x in (k, v))
        cached = cache is not None and cache[0].shape[2] > 0
        # Megatron TP routes through the same head-parallel shard_maps as
        # Ulysses (with sp=1 the a2a degenerates away and only the 'tensor'
        # head sharding remains); off-mesh both fall back to the local call
        tp_mode = tp > 1
        if (cfg.sp_attention in ("ulysses", "ring") or tp_mode) and cached:
            # inference SP: cache stays head-sharded at rest, only the tail
            # rides the all_to_alls (falls back to plain concat off-mesh).
            # Ring serves cached decode through the same path — the
            # ring's win (unbounded SP degree) is a training property.
            from ..parallel.ulysses import ulysses_attend_cached
            out = ulysses_attend_cached(q, new_kv[0], new_kv[1], cache[0],
                                        cache[1], q_meta, k_meta,
                                        impl=cfg.attn_impl, bias=bias)
        elif cfg.sp_attention == "ring":
            # blockwise ring over seq: K/V hop neighbour-to-neighbour
            # (ppermute) — SP degree not capped by head count
            from ..parallel.ring import ring_attend
            out = ring_attend(q, k, v, q_meta, k_meta, impl=cfg.attn_impl)
        elif cfg.sp_attention == "ulysses" or tp_mode:
            from ..parallel.ulysses import ulysses_attend
            out = ulysses_attend(q, k, v, q_meta, k_meta,
                                 impl=cfg.attn_impl, bias=bias)
        else:
            from ..ops.flash_attention import DecodeMask
            if cached and isinstance(bias, DecodeMask):
                # columnar decode: cache and tail feed the kernel as
                # separate operands — no per-step concat copy of the cache
                from ..ops.attention import attend_decode_split
                out = attend_decode_split(q, cache[0], cache[1], new_kv[0],
                                          new_kv[1], q_meta, k_meta, bias,
                                          impl=cfg.attn_impl)
            else:
                if cached:
                    # cached keys carry RoPE already (positions are constant
                    # across denoise steps within a block); concat heads-major
                    k = jnp.concatenate([cache[0].astype(k.dtype), new_kv[0]],
                                        axis=2)
                    v = jnp.concatenate([cache[1].astype(v.dtype), new_kv[1]],
                                        axis=2)
                out = attend(q, k, v, q_meta, k_meta, impl=cfg.attn_impl,
                             bias=bias, kv_heads_major=cached)
        out = out.reshape(b, l, h * d)
        out = LoraDense(cfg.hidden_size, cfg.lora_rank, cfg.lora_alpha,
                        self.dtype, name="o_proj")(out)
        return out, new_kv


class Phi3Mlp(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gate_up = nn.Dense(2 * self.cfg.intermediate_size, use_bias=False,
                           dtype=self.dtype, name="gate_up_proj")(x)
        tp = self.cfg.tensor_parallel
        if tp > 1:
            # TP-grouped fused layout: per-shard [gate_i|up_i] columns —
            # the silu*up product is shard-local, and the tp-major merge
            # keeps down_proj's row-sharded contraction block-aligned
            b, l, f = gate_up.shape
            gate, up = jnp.split(gate_up.reshape(b, l, tp, f // tp), 2,
                                 axis=-1)
            act = (nn.silu(gate) * up).reshape(b, l, -1)
        else:
            gate, up = jnp.split(gate_up, 2, axis=-1)
            act = nn.silu(gate) * up
        return nn.Dense(self.cfg.hidden_size, use_bias=False,
                        dtype=self.dtype, name="down_proj")(act)


class Phi3Layer(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache, cos, sin, q_meta, k_meta, bias):
        # x is the scan CARRY; everything layer-invariant (rope tables,
        # metadata, bias) rides as an nn.broadcast input — in the carry,
        # remat would checkpoint a copy PER LAYER and the scan backward
        # would stack them (32 x the [Lq, Lk] bias = 12G at 14k tokens)
        attn_in = RMSNorm(self.cfg.rms_norm_eps, self.dtype,
                          name="input_layernorm")(x)
        attn_out, new_kv = Phi3Attention(self.cfg, self.dtype,
                                         name="self_attn")(
            attn_in, cos, sin, q_meta, k_meta, cache, bias)
        x = x + attn_out
        mlp_in = RMSNorm(self.cfg.rms_norm_eps, self.dtype,
                         name="post_attention_layernorm")(x)
        x = x + Phi3Mlp(self.cfg, self.dtype, name="mlp")(mlp_in)
        if self.cfg.seq_shard or self.cfg.tensor_parallel > 1:
            # P(data, seq, None): under TP this is where the row-parallel
            # partial sums (o_proj / down_proj) resolve into all-reduces
            from ..parallel.mesh import constrain_activations
            x = constrain_activations(x)
        return x, new_kv


class Phi3Decoder(nn.Module):
    """Decoder trunk. Returns final-norm hidden states + per-layer KV."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs_embeds: jax.Array, pos_ids: jax.Array,
                 q_meta: AttnMeta, k_meta: AttnMeta,
                 cache: Optional[KVCache] = None,
                 bias: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, KVCache]:
        cfg = self.cfg
        cos, sin = rope_tables(pos_ids, cfg.head_dim, cfg.rope_theta,
                               self.dtype)
        layer = Phi3Layer
        if cfg.remat:
            layer = nn.remat(
                layer, prevent_cse=False,
                policy=jax.checkpoint_policies.nothing_saveable)
        stack = nn.scan(
            layer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.num_layers,
            unroll=cfg.scan_unroll,
        )(cfg, self.dtype, name="layers")
        if cache is None:
            # zero-length context: unifies the cached/uncached code paths
            b = inputs_embeds.shape[0]
            empty = jnp.zeros((cfg.num_layers, b, cfg.num_kv_heads, 0,
                               cfg.head_dim + (-cfg.head_dim % 128)),
                              self.dtype)
            cache = KVCache(empty, empty)
        x, kv = stack(inputs_embeds, (cache.k, cache.v), cos, sin,
                      q_meta, k_meta, bias)
        x = RMSNorm(cfg.rms_norm_eps, self.dtype, name="norm")(x)
        return x, KVCache(*kv)
