"""Pallas TPU attention with frame-block visibility.

Replaces the reference's dense-mask SDPA/fused-attention path
(LVM/transform/sdpa_transform.py:166, fa_transform.py:220). Two modes:

- **bias mode** (default at clip scale): the additive mask bias is computed
  ONCE per clip prediction from the token metadata — it is identical across
  every layer and every denoise step — stored bf16 in HBM, and each kernel
  instance streams its [block_q, Lk] slice. Grid is (B, H, q-blocks) with
  q-blocks innermost so K/V stay resident in VMEM across the whole row of a
  head (~30x less K/V DMA than a q-outer order). The kernel's VPU work is
  just softmax.
- **inline mode** (long sequences where a [B, Lq, Lk] bias won't fit): the
  visibility rule is evaluated in-kernel from per-token int32 vectors, with
  the bias cached in VMEM scratch and reused across heads (grid (B,
  q-blocks, H)). O(L) memory — this is the stage-4 path (1.28M tokens).

Forward-only: training uses the jnp reference path (differentiable); a
custom-VJP flash backward is future work.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import AttnMeta

NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
BF16_NEG = float(jnp.finfo(jnp.bfloat16).min) * 0.5


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _padded_visibility(q_meta: AttnMeta, k_meta: AttnMeta, lqp: int,
                       lkp: int) -> jax.Array:
    """[B, Lqp, Lkp] bool; padded queries act as pad rows over real keys,
    padded keys are never visible."""
    lq = q_meta.index.shape[1]
    lk = k_meta.vis_start.shape[1]

    def padq(x, fill):
        return jnp.pad(x, ((0, 0), (0, lqp - lq)), constant_values=fill)

    def padk(x, fill):
        return jnp.pad(x, ((0, 0), (0, lkp - lk)), constant_values=fill)

    q_idx = padq(q_meta.index, 0)[:, :, None]
    q_blk = padq(q_meta.q_block, -2)[:, :, None]
    q_off = padq(q_meta.q_offset, 0)[:, :, None]
    q_pad = padq(q_meta.is_pad, 1)[:, :, None]
    vis = padk(k_meta.vis_start, 2**30)[:, None, :]
    k_blk = padk(k_meta.noisy_block, -1)[:, None, :]
    k_role = padk(k_meta.noisy_role, 0)[:, None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lkp), 2)
    return ((q_idx >= vis)
            | ((k_blk >= 0) & (k_blk == q_blk) & (q_off >= k_role))
            | ((q_pad > 0) & (col < lk)))


def precompute_bias(q_meta: AttnMeta, k_meta: AttnMeta, block_q: int = 256
                    ) -> jax.Array:
    """bf16 additive bias [B, Lqp, Lkp], padded to kernel tiles."""
    lq = q_meta.index.shape[1]
    lk = k_meta.vis_start.shape[1]
    bq = min(block_q, _round_up(lq, 8))
    lqp = _round_up(lq, bq)
    lkp = _round_up(lk, 128)
    visible = _padded_visibility(q_meta, k_meta, lqp, lkp)
    return jnp.where(visible, jnp.bfloat16(0), jnp.bfloat16(BF16_NEG))


def _bias_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]            # [bq, Dp]
    k = k_ref[0, 0]            # [Lkp, Dp]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[0].astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def _inline_kernel(q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
                   vis_ref, k_blk_ref, k_role_ref,
                   q_ref, k_ref, v_ref, o_ref, bias_ref, *,
                   scale: float, lk_real: int):
    # grid (B, q-blocks, H): the bias depends only on (b, q-block), so it is
    # evaluated once into scratch and reused across all heads
    hi = pl.program_id(2)

    @pl.when(hi == 0)
    def _():
        q_idx = q_idx_ref[0, 0][:, None]
        q_blk = q_blk_ref[0, 0][:, None]
        q_off = q_off_ref[0, 0][:, None]
        q_pad = q_pad_ref[0, 0][:, None]
        vis = vis_ref[0, 0][None, :]
        k_blk = k_blk_ref[0, 0][None, :]
        k_role = k_role_ref[0, 0][None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, bias_ref.shape, 1)
        visible = (q_idx >= vis) | (
            (k_blk >= 0) & (k_blk == q_blk) & (q_off >= k_role)) | (
            (q_pad > 0) & (col < lk_real))
        bias_ref[:] = jnp.where(visible, jnp.bfloat16(0),
                                jnp.bfloat16(BF16_NEG))

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[:].astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def flash_attention_supported(q, k, v) -> bool:
    try:
        platform = q.devices().pop().platform if hasattr(q, "devices") \
            else jax.default_backend()
    except Exception:
        platform = jax.default_backend()
    if platform != "tpu":
        return False
    b, lq, h, d = q.shape
    hkv = k.shape[2]
    return h % hkv == 0 and d <= 128


def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array,
              q_meta: AttnMeta, k_meta: AttnMeta,
              bias: Optional[jax.Array] = None,
              block_q: Optional[int] = None,
              interpret: bool = False) -> jax.Array:
    """q [B,Lq,H,D], k/v [B,Lk,Hkv,D] -> [B,Lq,H,D]. ``bias`` is the output
    of :func:`precompute_bias` (fast path); None selects the inline mode."""
    b, lq, h, d = q.shape
    lk, hkv = k.shape[1], k.shape[2]
    if block_q is None:
        # measured sweet spots on v5e (bq=512 exceeds the 16MB VMEM budget)
        block_q = 256 if bias is not None else 128
    scale = d ** -0.5
    dp = _round_up(d, 128)
    block_q = min(block_q, _round_up(lq, 8))
    lqp = _round_up(lq, block_q)
    lkp = _round_up(lk, 128)

    qt = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
    group = h // hkv
    out_shape = jax.ShapeDtypeStruct((b, h, lqp, dp), q.dtype)
    cost = pl.CostEstimate(
        flops=4 * b * h * lqp * lkp * dp,
        bytes_accessed=(qt.size + kt.size + vt.size
                        + b * h * lqp * dp) * qt.dtype.itemsize,
        transcendentals=b * h * lqp * lkp,
    )

    if bias is not None:
        assert bias.shape == (b, lqp, lkp), (bias.shape, (b, lqp, lkp))
        # K/V stay VMEM-resident across the q sweep of each head
        grid = (b, h, lqp // block_q)
        out = pl.pallas_call(
            functools.partial(_bias_kernel, scale=scale),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, lkp),
                             lambda bi, hi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q, dp),
                             lambda bi, hi, qi: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, lkp, dp),
                             lambda bi, hi, qi: (bi, hi // group, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, lkp, dp),
                             lambda bi, hi, qi: (bi, hi // group, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, dp),
                                   lambda bi, hi, qi: (bi, hi, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost,
        )(bias, qt, kt, vt)
        return out[:, :, :lq, :d].transpose(0, 2, 1, 3)

    # inline mode: metadata evaluated in-kernel, O(L) memory
    def padq(x, fill):
        return jnp.pad(x, ((0, 0), (0, lqp - lq)),
                       constant_values=fill)[:, None, :]

    def padk(x, fill):
        return jnp.pad(x, ((0, 0), (0, lkp - lk)),
                       constant_values=fill)[:, None, :]

    q_idx = padq(q_meta.index, 0)
    q_blk = padq(q_meta.q_block, -2)
    q_off = padq(q_meta.q_offset, 0)
    q_pad = padq(q_meta.is_pad, 1)
    vis = padk(k_meta.vis_start, 2**30)
    k_blk = padk(k_meta.noisy_block, -1)
    k_role = padk(k_meta.noisy_role, 0)

    grid = (b, lqp // block_q, h)

    def qspec():
        return pl.BlockSpec((1, 1, block_q, dp),
                            lambda bi, qi, hi: (bi, hi, qi, 0),
                            memory_space=pltpu.VMEM)

    def kvspec():
        return pl.BlockSpec((1, 1, lkp, dp),
                            lambda bi, qi, hi: (bi, hi // group, 0, 0),
                            memory_space=pltpu.VMEM)

    def qmeta_spec():
        return pl.BlockSpec((1, 1, block_q), lambda bi, qi, hi: (bi, 0, qi),
                            memory_space=pltpu.VMEM)

    def kmeta_spec():
        return pl.BlockSpec((1, 1, lkp), lambda bi, qi, hi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_inline_kernel, scale=scale, lk_real=lk),
        grid=grid,
        in_specs=[qmeta_spec(), qmeta_spec(), qmeta_spec(), qmeta_spec(),
                  kmeta_spec(), kmeta_spec(), kmeta_spec(),
                  qspec(), kvspec(), kvspec()],
        out_specs=qspec(),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_q, lkp), jnp.bfloat16)],
        interpret=interpret,
        cost_estimate=cost,
    )(q_idx, q_blk, q_off, q_pad, vis, k_blk, k_role, qt, kt, vt)
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3)
