"""Pallas TPU attention with frame-block visibility computed in-kernel.

Replaces the reference's dense-mask SDPA/fused-attention path
(LVM/transform/sdpa_transform.py:166, fa_transform.py:220): instead of
shipping an O(L²) mask and materializing [B, H, L, L] logits in HBM, each
kernel instance holds one query block + the full K/V rows for its (batch,
head) in VMEM, evaluates the visibility rule from per-token int32 metadata
(see ops/attention.py), and writes only the [bq, D] output. At the flagship
sequence length (~5.3k tokens) this removes the ~7 GB fp32 logits round-trip
per step that the jnp reference path would incur.

Layout: grid (B, H, Lq/bq); K/V blocked per-(b, kv-head) so GQA needs no
materialized repeat. Head dim is zero-padded to the 128-lane width; softmax
runs in fp32 on the VPU; both matmuls hit the MXU with
preferred_element_type=f32.

Forward-only: training uses the jnp reference path (differentiable); a
custom-VJP flash backward is future work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import AttnMeta

NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
            vis_ref, k_blk_ref, k_role_ref,
            q_ref, k_ref, v_ref, o_ref, *, scale: float, lk_real: int):
    q = q_ref[0, 0]            # [bq, Dp]
    k = k_ref[0, 0]            # [Lkp, Dp]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [bq, Lkp]

    q_idx = q_idx_ref[0, 0][:, None]      # [bq, 1]
    q_blk = q_blk_ref[0, 0][:, None]
    q_off = q_off_ref[0, 0][:, None]
    q_pad = q_pad_ref[0, 0][:, None]
    vis = vis_ref[0, 0][None, :]          # [1, Lkp]
    k_blk = k_blk_ref[0, 0][None, :]
    k_role = k_role_ref[0, 0][None, :]

    # pad query rows attend all REAL keys (reference pad-row semantics);
    # keys beyond lk_real are kernel padding and stay invisible
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    visible = (q_idx >= vis) | (
        (k_blk >= 0) & (k_blk == q_blk) & (q_off >= k_role)) | (
        (q_pad > 0) & (col < lk_real))
    logits = jnp.where(visible, logits, NEG)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
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
              block_q: int = 128, interpret: bool = False) -> jax.Array:
    """q [B,Lq,H,D], k/v [B,Lk,Hkv,D] -> [B,Lq,H,D]."""
    b, lq, h, d = q.shape
    lk, hkv = k.shape[1], k.shape[2]
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

    # metadata padding: padded queries behave as pad rows (attend all, output
    # discarded); padded keys are never visible
    def padq(x, fill):
        # [B, 1, Lqp]: keeps the (sublane, lane) block dims tiling-legal
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

    grid = (b, h, lqp // block_q)
    group = h // hkv

    def qspec():
        return pl.BlockSpec((1, 1, block_q, dp),
                            lambda bi, hi, qi: (bi, hi, qi, 0),
                            memory_space=pltpu.VMEM)

    def kvspec():
        return pl.BlockSpec((1, 1, lkp, dp),
                            lambda bi, hi, qi: (bi, hi // group, 0, 0),
                            memory_space=pltpu.VMEM)

    def qmeta_spec():
        return pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi: (bi, 0, qi),
                            memory_space=pltpu.VMEM)

    def kmeta_spec():
        return pl.BlockSpec((1, 1, lkp), lambda bi, hi, qi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, lk_real=lk),
        grid=grid,
        in_specs=[qmeta_spec(), qmeta_spec(), qmeta_spec(), qmeta_spec(),
                  kmeta_spec(), kmeta_spec(), kmeta_spec(),
                  qspec(), kvspec(), kvspec()],
        out_specs=qspec(),
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * lkp * dp,
            bytes_accessed=(qt.size + kt.size * group + vt.size * group
                            + b * h * lqp * dp) * qt.dtype.itemsize,
            transcendentals=b * h * lqp * lkp,
        ),
    )(q_idx, q_blk, q_off, q_pad, vis, k_blk, k_role, qt, kt, vt)
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3)
