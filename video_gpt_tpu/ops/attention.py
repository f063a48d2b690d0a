"""Attention with frame-block visibility computed from token metadata.

The reference ships dense O(L²) uint8 masks from host to device and converts
them to additive biases per backend (OmniGen/transformer.py:128-151). Here the
mask never exists on the host: :class:`AttnMeta` carries five per-token int32
vectors and the visibility rule (DESIGN.md) is evaluated where it is needed —
inside the kernel (Pallas path) or as a fused jnp expression (reference path).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..tokens import Kind


class AttnMeta(NamedTuple):
    """Per-token mask metadata, all int32 [B, L] (see layout.SequenceLayout)."""

    index: jax.Array        # global sequence position of each token
    vis_start: jax.Array    # key side: visible to queries q >= vis_start
    noisy_block: jax.Array  # key side: frame-block id of noisy keys else -1
    noisy_role: jax.Array   # key side: 0 diff / 1 time / 2 patch
    q_block: jax.Array      # query side: noisy frame-block id else -1
    q_offset: jax.Array     # query side: offset within the noisy frame
    is_pad: jax.Array       # bool-ish: 1 where PAD

    @classmethod
    def from_layout(cls, layout) -> "AttnMeta":
        b, l = layout.kind.shape
        idx = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[None], (b, l))
        return cls(
            index=idx,
            vis_start=jnp.asarray(layout.vis_start),
            noisy_block=jnp.asarray(layout.noisy_block),
            noisy_role=jnp.asarray(layout.noisy_role),
            q_block=jnp.asarray(layout.q_block),
            q_offset=jnp.asarray(layout.q_offset),
            is_pad=jnp.asarray(layout.kind == int(Kind.PAD)).astype(jnp.int32),
        )

    def tail(self, tail_len: int) -> "AttnMeta":
        """Metadata slice for the trailing ``tail_len`` tokens (the noisy clip
        in inference layouts) — the query side of cached decoding."""
        return AttnMeta(*(x[:, -tail_len:] for x in self))


def visibility(q: AttnMeta, k: AttnMeta) -> jax.Array:
    """[B, Lq, Lk] bool: may query q attend key k.

    Rule (bit-exact vs LVM/processor.py:575-731, see tests/test_layout_golden):
      pad rows attend everything; clean/causal keys from ``vis_start``;
      noisy keys only within the same frame-block with role offsets.
    """
    causal = q.index[:, :, None] >= k.vis_start[:, None, :]
    noisy = (
        (k.noisy_block[:, None, :] >= 0)
        & (k.noisy_block[:, None, :] == q.q_block[:, :, None])
        & (q.q_offset[:, :, None] >= k.noisy_role[:, None, :])
    )
    pad_row = q.is_pad[:, :, None] > 0
    return causal | noisy | pad_row


def attention_bias(q: AttnMeta, k: AttnMeta,
                   dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Additive [B, 1, Lq, Lk] bias: 0 where visible, finfo.min where not."""
    vis = visibility(q, k)
    neg = jnp.asarray(jnp.finfo(dtype).min, dtype)
    return jnp.where(vis, jnp.zeros((), dtype), neg)[:, None, :, :]


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                  bias: Optional[jax.Array],
                  kv_heads_major: bool = False) -> jax.Array:
    """Plain masked attention; q [B,Lq,H,D], k/v [B,Lk,Hkv,D] -> [B,Lq,H,D].

    fp32 softmax; XLA fuses the bias add. Used for parity tests and as the
    fallback when the Pallas kernel doesn't apply. ``kv_heads_major``: k/v
    arrive [B,Hkv,Lk,D] (the KV-cache layout)."""
    b, lq, h, d = q.shape
    if kv_heads_major and k.shape[-1] != d:
        # the KV cache is lane-padded to 128 (see phi3.KVCache); crop
        k = k[..., :d]
        v = v[..., :d]
    h_axis = 1 if kv_heads_major else 2
    hkv = k.shape[h_axis]
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=h_axis)
        v = jnp.repeat(v, rep, axis=h_axis)
    scale = d ** -0.5
    k_sub = "bhkd" if kv_heads_major else "bkhd"
    logits = jnp.einsum(f"bqhd,{k_sub}->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(f"bhqk,{k_sub}->bqhd", probs.astype(v.dtype), v)
    return out


def mha_chunked(q: jax.Array, k: jax.Array, v: jax.Array,
                bias: Optional[jax.Array], head_chunk: int = 4) -> jax.Array:
    """Differentiable memory-bounded attention for TRAINING.

    Serialises over head chunks with rematerialisation: peak logits memory is
    [B, head_chunk, Lq, Lk] instead of [B, H, Lq, Lk], and the backward pass
    recomputes per chunk. At stage-2+ sequence lengths (~10-18k tokens) the
    all-heads fp32 logits the dense path would materialise (several GB per
    residual) do not fit; this path trades ~no wall-clock for O(H/hc) less
    memory. (A custom-VJP flash backward is the eventual replacement.)
    """
    b, lq, h, d = q.shape
    hkv = k.shape[2]
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    hc = math.gcd(head_chunk, h)
    n_chunks = h // hc
    qc = jnp.moveaxis(q.reshape(b, lq, n_chunks, hc, d), 2, 0)
    kc = jnp.moveaxis(k.reshape(b, k.shape[1], n_chunks, hc, d), 2, 0)
    vc = jnp.moveaxis(v.reshape(b, v.shape[1], n_chunks, hc, d), 2, 0)

    @jax.checkpoint
    def one(args):
        qi, ki, vi = args
        return mha_reference(qi, ki, vi, bias)

    out = jax.lax.map(one, (qc, kc, vc))  # [n_chunks, B, Lq, hc, D]
    return jnp.moveaxis(out, 0, 2).reshape(b, lq, h, d)


def attend_decode_split(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                        k_new: jax.Array, v_new: jax.Array,
                        q_meta: AttnMeta, k_meta: AttnMeta, mask,
                        impl: str = "auto") -> jax.Array:
    """Cached-decode attention with SEPARATE cache/tail operands.

    ``k/v_cache`` are the at-rest KVCache tensors [B,Hkv,Lc,Dp] (heads-major,
    lane-padded), ``k/v_new`` the current tokens in the same layout, ``mask``
    a :class:`~.flash_attention.DecodeMask` over the concatenated key space.
    The split kernels consume both directly — no per-layer-per-step
    ``concat([cache, new])`` copy (see ``_decode_split_kernel``). Falls back
    to concat + :func:`attend` where the Pallas kernels don't apply (CPU
    reference path, non-columnar masks)."""
    from .flash_attention import (INTERPRET, DecodeMask,
                                  flash_attention_supported,
                                  flash_mha_decode_split,
                                  flash_mha_decode_streaming_split)
    assert isinstance(mask, DecodeMask)
    if impl in ("auto", "pallas"):
        b, hkv, lc, dp = k_cache.shape
        lt = k_new.shape[2]
        h = q.shape[2]
        # shape-only probe: flash_attention_supported never reads values,
        # so an abstract stand-in for the concatenated key space suffices
        # (jnp.empty here would trace a dead full-cache-sized allocation)
        if flash_attention_supported(
                q, jax.ShapeDtypeStruct((b, hkv, lc + lt, dp), k_cache.dtype),
                None, kv_heads_major=True):
            return flash_mha_decode_split(q, k_cache, v_cache, k_new, v_new,
                                          mask)
        if ((jax.default_backend() == "tpu" or INTERPRET)
                and h % hkv == 0 and q.shape[3] <= 128):
            return flash_mha_decode_streaming_split(
                q, k_cache, v_cache, k_new, v_new, mask)
    k = jnp.concatenate([k_cache.astype(k_new.dtype), k_new], axis=2)
    v = jnp.concatenate([v_cache.astype(v_new.dtype), v_new], axis=2)
    return attend(q, k, v, q_meta, k_meta, impl=impl, bias=mask,
                  kv_heads_major=True)


def attend(q: jax.Array, k: jax.Array, v: jax.Array,
           q_meta: AttnMeta, k_meta: AttnMeta, impl: str = "auto",
           bias: Optional[jax.Array] = None,
           kv_heads_major: bool = False) -> jax.Array:
    """Metadata-masked attention dispatch. ``bias`` is an optional
    precomputed bf16 bias (ops.flash_attention.precompute_bias) shared
    across layers/steps, or a ``DecodeMask`` (columnar per-key rank — the
    zero-bias-traffic decode kernel); the dense fallback derives its own.

    ``kv_heads_major``: k/v arrive [B,Hkv,Lk,D] — the KV-cache layout, so
    only the (non-differentiated) cached-inference paths accept it; the
    custom-VJP training wrappers are bypassed in favour of their forward
    impls."""
    from .flash_attention import DecodeMask
    if isinstance(bias, DecodeMask):
        from .flash_attention import (INTERPRET, flash_attention_supported,
                                      flash_mha_decode,
                                      flash_mha_decode_streaming)
        if impl in ("auto", "pallas") and flash_attention_supported(
                q, k, v, kv_heads_major):
            return flash_mha_decode(q, k, v, bias,
                                    kv_heads_major=kv_heads_major)
        hkv = k.shape[1] if kv_heads_major else k.shape[2]
        if (impl in ("auto", "pallas")
                and (jax.default_backend() == "tpu" or INTERPRET)
                and q.shape[2] % hkv == 0 and q.shape[3] <= 128):
            # beyond the resident cap (long-rollout windows): k-streaming
            # columnar kernel — 2 int32 vectors instead of the 7-vector
            # inline rule, and no online-softmax rescaling at all
            return flash_mha_decode_streaming(q, k, v, bias,
                                              kv_heads_major=kv_heads_major)
        bias = None  # fall through: derive the dense bias from metadata
    if impl in ("auto", "pallas"):
        try:
            from .flash_attention import (flash_attention_supported,
                                          flash_mha, flash_mha_biased,
                                          flash_mha_inline,
                                          flash_mha_streaming)
            if flash_attention_supported(q, k, v, kv_heads_major):
                if kv_heads_major:
                    # cached inference: forward impl directly (no vjp)
                    return flash_mha(q, k, v, q_meta, k_meta, bias=bias,
                                     kv_heads_major=True)
                # both paths are differentiable (custom-VJP Pallas backward)
                if bias is not None:
                    return flash_mha_biased(q, k, v, bias)
                return flash_mha_inline(q, k, v, q_meta, k_meta)
            from .flash_attention import INTERPRET
            hkv = k.shape[1] if kv_heads_major else k.shape[2]
            if (jax.default_backend() == "tpu" or INTERPRET) \
                    and q.shape[2] % hkv == 0 and q.shape[3] <= 128:
                # beyond the resident kernels' key cap: k-streaming kernels
                if kv_heads_major:
                    from .flash_attention import (_flash_streaming_fwd,
                                                  _stream_inline_fwd)
                    if bias is not None:
                        return _flash_streaming_fwd(q, k, v, bias,
                                                    kv_heads_major=True)
                    return _stream_inline_fwd(q, k, v, q_meta, k_meta,
                                              kv_heads_major=True)[0]
                if bias is not None:
                    return flash_mha_streaming(q, k, v, bias)
                from .flash_attention import flash_mha_streaming_inline
                # metadata-inline: O(L) mask memory, fwd AND bwd streaming
                # Pallas kernels — the stage-2/3/4 training path
                return flash_mha_streaming_inline(q, k, v, q_meta, k_meta)
        except ImportError:
            pass
        if impl == "pallas":
            raise RuntimeError("pallas flash attention unavailable for these "
                               f"shapes: q={q.shape} k={k.shape}")
    dense_bias = attention_bias(q_meta, k_meta, jnp.float32)
    if impl == "chunked":
        if kv_heads_major:  # chunked is a training path; normalise layout
            k = k[..., :q.shape[-1]].transpose(0, 2, 1, 3)
            v = v[..., :q.shape[-1]].transpose(0, 2, 1, 3)
        return mha_chunked(q, k, v, dense_bias)
    return mha_reference(q, k, v, dense_bias, kv_heads_major=kv_heads_major)
