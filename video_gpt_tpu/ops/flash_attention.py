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
- **inline mode** (when the [B, Lq, Lk] bias exceeds its HBM budget): the
  visibility rule is evaluated in-kernel from per-token int32 vectors, with
  the bias cached in VMEM scratch and reused across heads (grid (B,
  q-blocks, H)); O(L) host/HBM memory.

The resident modes keep the full key row per (batch, head) in VMEM, capping
them at ~8k keys on v5e (16MB VMEM). Beyond that the k-STREAMING kernels
take over, all length-unbounded: :func:`flash_mha_streaming` (bias mode,
online-softmax over k-tiles; 57ms at the reference's 80-frame-window decode
shape Lq=5.3k, Lk=17.8k, where the dense path cannot allocate its 24GB
logits at all), :func:`flash_mha_streaming_inline` (metadata-inline mask,
O(L) mask memory, with a streaming Pallas BACKWARD pair —
``_stream_dq_kernel``/``_stream_dkv_kernel`` — making it the stage-2/3/4
training path), and :func:`flash_mha_decode_streaming` (columnar per-key
rank, the long-rollout decode path).

Training: :func:`flash_mha_biased` wraps the bias mode in a ``custom_vjp``
whose backward is also a Pallas kernel (one-pass, softmax recomputed per
q-block against VMEM-resident K/V, dK/dV accumulated in revisited f32
output blocks); :func:`flash_mha_streaming_inline` does the same beyond
the resident cap with streaming fwd+bwd kernels.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import AttnMeta

BF16_NEG = float(jnp.finfo(jnp.bfloat16).min) * 0.5

# module-level interpret toggle (CPU tests flip this; per-call `interpret`
# args still win where exposed)
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kv_dims(k, kv_heads_major: bool):
    """(lk, hkv) for k/v in [B,Lk,Hkv,D] (default) or [B,Hkv,Lk,D] layout.

    The KV cache is stored heads-major — the layout every kernel consumes —
    so that XLA never hoists full-cache transposed copies out of the denoise
    scan (2 x 2.4G HBM at 80-frame windows, an OOM at window scale)."""
    return (k.shape[2], k.shape[1]) if kv_heads_major else (
        k.shape[1], k.shape[2])


def _kv_hm(x, kv_heads_major: bool):
    """To heads-major [B,H,L,D] (no-op when already stored that way)."""
    return x if kv_heads_major else x.transpose(0, 2, 1, 3)


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


def _stream_block_q(lq: int, block_q: int) -> int:
    """Equalized q-tile for the k-streaming decode kernels: same tile COUNT
    as ``block_q`` would give, minimal padding. The kernels execute
    ``round_up(lq, bq)`` query rows on the MXU, so the last tile's padding
    is pure wasted attention work — e.g. Lq 7248 at bq 2048 runs 8192 rows
    (+13%); the equalized 4x1824 runs 7296 (+0.7%). Tile count (hence the
    per-q-block K/V re-stream traffic) is unchanged, so this strictly
    reduces compute. 16-row granularity (bf16 sublane tile)."""
    nb = -(-lq // block_q)
    return min(block_q, _round_up(-(-lq // nb), 16))


def _fwd_block_q(lq: int, lk: int) -> int:
    # measured VMEM points on v5e: (bq=256, Lk=5376) -> 15.8M OK;
    # (bq=128, Lk=6912) -> 16.9M OOM; (bq=96, Lk=6912) fits
    base = 256 if _round_up(lk, 128) <= 5504 else 96
    return min(base, _round_up(lq, 8))


def precompute_bias(q_meta: AttnMeta, k_meta: AttnMeta,
                    block_q: Optional[int] = None) -> jax.Array:
    """bf16 additive bias [B, Lqp, Lkp], padded to the forward kernel's
    tiles (the auto rule here matches flash_mha's, so no re-pad copy)."""
    lq = q_meta.index.shape[1]
    lk = k_meta.vis_start.shape[1]
    bq = block_q if block_q is not None else _fwd_block_q(lq, lk)
    bq = min(bq, _round_up(lq, 8))
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
        # f32 select, not bf16: the i1 mask comes out of the int32 compares
        # in (8, 128)-tiled layout, and relayouting it for a (16, 128) bf16
        # select is an invalid relayout on real mosaic (interpret mode
        # accepts it — caught by tests_tpu). The f32 scratch also skips the
        # astype on every consuming head.
        bias_ref[:] = jnp.where(visible, 0.0, float(BF16_NEG))

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[:]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def _bwd_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, group: int):
    """One-pass backward: grid (B, H, q-blocks), dK/dV accumulated in
    revisited f32 output blocks. The softmax is recomputed per q-block over
    the full key row (K/V are VMEM-resident), so no l/m residuals are needed
    (cf. the streaming two-kernel scheme in
    jax.experimental.pallas.ops.tpu.flash_attention)."""
    hi = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when((qi == 0) & (hi % group == 0))
    def _():
        # dK/dV accumulate in bf16: the f32 versions push VMEM past 16MB at
        # ~7k-key rows (accumulation noise measured ~1e-3 vs dense grads)
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    q = q_ref[0, 0]                    # [bq, Dp]
    k = k_ref[0, 0]                    # [Lkp, Dp]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    di = jnp.sum(o * do, axis=-1, keepdims=True)  # [bq, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)   # [bq, Lkp]

    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - di) * scale                    # [bq, Lkp]
    dq_ref[0, 0] = jnp.dot(ds, k.astype(jnp.float32),
                           preferred_element_type=jnp.float32
                           ).astype(dq_ref.dtype)
    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _flash_bwd(q, k, v, bias, o, do, scale, block_q=None):
    b, lq, h, d = q.shape
    lk, hkv = k.shape[1], k.shape[2]
    if block_q is None:
        # measured: backward VMEM ~ Lk*(1536 + 44*bq) bytes on v5e. Restricted
        # to {8,16,32} so forward-padded bias rows (multiples of 256 or 96)
        # are always reusable without a re-pad copy.
        lk_pad = _round_up(lk, 128)
        fit = int((15e6 / lk_pad - 1536) / 44)
        block_q = 32 if fit >= 32 else (16 if fit >= 16 else 8)
    dp_ = _round_up(d, 128)
    bq = min(block_q, _round_up(lq, 8))
    lqp = _round_up(lq, bq)
    lkp = _round_up(lk, 128)
    group = h // hkv

    def padt(x):
        return jnp.pad(x.transpose(0, 2, 1, 3),
                       ((0, 0), (0, 0), (0, lqp - x.shape[1]),
                        (0, dp_ - d)))

    qt, kt, vt, ot, dot_ = padt(q), jnp.pad(
        k.transpose(0, 2, 1, 3),
        ((0, 0), (0, 0), (0, lkp - lk), (0, dp_ - d))), jnp.pad(
        v.transpose(0, 2, 1, 3),
        ((0, 0), (0, 0), (0, lkp - lk), (0, dp_ - d))), padt(o), padt(do)
    # forward-padded bias rows (multiple of 256/96) are directly usable by
    # the {8,16,32} backward blocks; copy only if genuinely incompatible
    if bias.shape[1] < lqp or bias.shape[1] % bq or bias.shape[2] != lkp:
        bias = jnp.pad(bias[:, :lq, :lkp],
                       ((0, 0), (0, lqp - lq), (0, 0)))

    grid = (b, h, lqp // bq)
    qspec = pl.BlockSpec((1, 1, bq, dp_), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, lkp, dp_),
                          lambda bi, hi, qi: (bi, hi // group, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, bq, lkp), lambda bi, hi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM)
    dkv_spec = pl.BlockSpec((1, 1, lkp, dp_),
                            lambda bi, hi, qi: (bi, hi // group, 0, 0),
                            memory_space=pltpu.VMEM)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, group=group),
        grid=grid,
        in_specs=[bias_spec, qspec, kvspec, kvspec, qspec, qspec],
        out_specs=(qspec, dkv_spec, dkv_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lqp, dp_), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, lkp, dp_), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, lkp, dp_), v.dtype),
        ),
        interpret=INTERPRET,
    )(bias, qt, kt, vt, ot, dot_)
    dq = dq[:, :, :lq, :d].transpose(0, 2, 1, 3).astype(q.dtype)
    dk = dk[:, :, :lk, :d].transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dv[:, :, :lk, :d].transpose(0, 2, 1, 3).astype(v.dtype)
    return dq, dk, dv


@jax.custom_vjp
def _inline_vjp(q, k, v, *meta):
    qm, km = AttnMeta(*meta[:7]), AttnMeta(*meta[7:])
    return flash_mha(q, k, v, qm, km)


def _inline_vjp_fwd(q, k, v, *meta):
    qm, km = AttnMeta(*meta[:7]), AttnMeta(*meta[7:])
    o = flash_mha(q, k, v, qm, km)
    return o, (q, k, v, o, meta)


def _inline_vjp_bwd(res, do):
    q, k, v, o, meta = res
    qm, km = AttnMeta(*meta[:7]), AttnMeta(*meta[7:])
    bias = precompute_bias(qm, km)
    dq, dk, dv = _flash_bwd(q, k, v, bias, o, do, q.shape[-1] ** -0.5)
    return (dq, dk, dv) + (None,) * len(meta)


_inline_vjp.defvjp(_inline_vjp_fwd, _inline_vjp_bwd)


def flash_mha_inline(q, k, v, q_meta: AttnMeta, k_meta: AttnMeta):
    """Differentiable inline-mode flash attention: Pallas forward with the
    in-kernel mask; the backward derives the bias (bounded by the 8k-key
    kernel cap, so at most ~130MB bf16) and runs the Pallas backward kernel.
    The metadata rides as explicit zero-cotangent custom_vjp operands —
    closing over it would leak per-shard tracers when this runs inside
    shard_map under nn.scan (Ulysses SP training)."""
    return _inline_vjp(q, k, v, *tuple(q_meta), *tuple(k_meta))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_mha_biased(q, k, v, bias, block_q: Optional[int] = None):
    """Differentiable bias-mode flash attention (forward == flash_mha with a
    precomputed bias; backward is a Pallas kernel as well)."""
    return _flash_fwd_impl(q, k, v, bias, block_q)


def _flash_fwd_impl(q, k, v, bias, block_q):
    dummy = AttnMeta(*([None] * 7))  # bias mode ignores metadata
    return flash_mha(q, k, v, dummy, dummy, bias=bias, block_q=block_q)


def _flash_fwd_rule(q, k, v, bias, block_q):
    o = _flash_fwd_impl(q, k, v, bias, block_q)
    return o, (q, k, v, bias, o)


def _flash_bwd_rule(block_q, res, do):
    q, k, v, bias, o = res
    scale = q.shape[-1] ** -0.5
    dq, dk, dv = _flash_bwd(q, k, v, bias, o, do, scale)
    return dq, dk, dv, None


flash_mha_biased.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _decode_pipe_nsub() -> int:
    """Key-subtile count for the software-pipelined resident decode body
    (env ``VGT_DECODE_NSUB``, default 1 = the serial body). Read at trace
    time; >1 interleaves independent MXU/VPU chains (see
    :func:`_pipelined_rank_attn`)."""
    return max(int(os.environ.get("VGT_DECODE_NSUB", "1")), 1)


def _subtile_chunks(k, v, rank1d, nsub):
    """Split resident [Lkp, Dp] K/V (+ per-key rank [Lkp]) into ``nsub``
    lane-aligned subtiles for the pipelined body. Falls back to fewer
    subtiles until the boundary is a multiple of 128 (Mosaic lane rule)."""
    lkp = k.shape[0]
    while nsub > 1 and lkp % (nsub * 128):
        nsub -= 1
    bk = lkp // nsub
    return [(k[j * bk:(j + 1) * bk], v[j * bk:(j + 1) * bk],
             rank1d[j * bk:(j + 1) * bk][None, :]) for j in range(nsub)]


def _pipelined_rank_attn(q, qoff, chunks, kscale):
    """Software-pipelined unshifted-exp2 rank attention over key chunks.

    The serial decode body runs QK^T (MXU) -> masked exp2 (VPU/EUP) -> PV
    (MXU) as three dependent phases; with the key row split into chunks,
    chunk j+1's QK dot is ISSUED BEFORE chunk j's exp2 pass, giving the
    VLIW scheduler independent MXU and VPU chains to co-schedule — the
    classic two-stage software pipeline. Math is bit-identical to the
    serial body: without a max-shift, exp2 sums and PV accumulators are
    plain f32 additions across chunks (same element order within a chunk,
    left-to-right f32 adds across chunk partials).

    ``chunks``: [(k [bk, Dp], v [bk, Dp], rank [1, bk]), ...].
    Returns (l [bq, 1], acc [bq, Dp]) — the caller normalises."""
    def score(c):
        return jax.lax.dot_general(
            q, c[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * kscale

    s_prev = score(chunks[0])
    l = None
    acc = None
    for j in range(len(chunks)):
        s_cur = score(chunks[j + 1]) if j + 1 < len(chunks) else None
        _, v, rank = chunks[j]
        p = jnp.where(qoff >= rank,
                      jnp.exp2(jnp.clip(s_prev, -100.0, 100.0)), 0.0)
        lj = jnp.sum(p, axis=-1, keepdims=True)
        aj = jnp.dot(p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
        l = lj if l is None else l + lj
        acc = aj if acc is None else acc + aj
        s_prev = s_cur
    return l, acc


def _decode_kernel(qoff_ref, rank_ref, q_ref, k_ref, v_ref, o_ref, *,
                   kscale: float, nsub: int = 1):
    """Decode-step kernel: the frame-block mask collapses to a per-key rank
    (``visible(q,k) = q_off(q) >= rank(k)``, see :func:`decode_rank`) — one
    VPU compare per element and ZERO bias HBM traffic (the bias-mode kernel
    streams ~Lq*Lk bf16 per head per layer, ~100ms/step at flagship decode
    shapes). Softmax normalisation divides the [bq, D] output instead of the
    [bq, Lk] probabilities (one fewer full VPU pass) and runs on exp2 with
    scale*log2(e) folded into the score scale.

    No max-subtraction: exp2 runs directly on the scaled scores and the
    mask folds into the SAME pass via ``where`` — two fewer full [bq, Lk]
    VPU passes (max-reduce + subtract-broadcast) than the safe flash
    recurrence. Validity bounds: the UPPER clamp at +100 log2-units keeps
    the f32 denominator sum exact up to ~1M keys (2^100 * 1e6 < f32 max),
    and only distorts results if a real logit exceeds ~69 nats — far beyond
    anything trained attention produces (bf16 activations, scale 1/sqrt(D);
    even logit-sink spikes sit around tens of nats). The LOWER clamp at
    -100 log2-units has the dual failure mode: if EVERY visible key of a
    query row scores below ~-69 nats, all rows clip to the same floor and
    the softmax silently degrades toward uniform attention over those keys
    instead of preserving their relative weights (rows where at least one
    key is within 139 nats of the best are unaffected — the floored keys'
    2^-100 mass vanishes in the sum). Both regimes are unreachable for
    checkpoints whose logits stay within ~±69 nats; if one ever violates
    that, use the bias-mode kernel (max-subtracted) instead —
    ``utils.parity`` probes compare the two paths on real weights."""
    q = q_ref[0, 0]                    # [bq, Dp]
    k = k_ref[0, 0]                    # [Lkp, Dp]
    v = v_ref[0, 0]
    # qoff rides in the SUBLANE dim ([B, Lq, 1]) so its q-block only needs
    # 8-divisibility — the VMEM-pressure block sizes (96) aren't multiples
    # of 128, which a lane-dim block spec would require
    qoff = qoff_ref[0]                 # [bq, 1] int32
    if nsub > 1:
        l, acc = _pipelined_rank_attn(
            q, qoff, _subtile_chunks(k, v, rank_ref[0, 0], nsub), kscale)
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * kscale
    rank = rank_ref[0, 0][None, :]     # [1, Lkp] int32
    p = jnp.where(qoff >= rank,
                  jnp.exp2(jnp.clip(s, -100.0, 100.0)), 0.0)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    acc = jnp.dot(p.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


class DecodeMask(NamedTuple):
    """Columnar decode mask: ``visible(q,k) = q_off[q] >= rank[k]``.

    Valid when every tail query shares one noisy frame-block and every key is
    either visible to the whole tail, never visible, or a same-block noisy
    key gated by its role — exactly the inference decode step (the host-side
    predicate is :func:`video_gpt_tpu.layout.decode_rank`)."""

    rank: jax.Array   # [B, Lk] int32
    q_off: jax.Array  # [B, Lq] int32


def flash_mha_decode(q, k, v, mask: DecodeMask,
                     block_q: Optional[int] = None,
                     interpret: bool = False,
                     kv_heads_major: bool = False) -> jax.Array:
    """Resident flash attention for the inference decode step (fwd-only).

    q [B,Lq,H,D], k/v [B,Lk,Hkv,D] -> [B,Lq,H,D]. Grid (B, H, q-blocks):
    K/V stay VMEM-resident across each head's q sweep; the rank vector is
    ~Lk int32 revisited per batch row. No [Lq, Lk] bias exists anywhere.
    ``kv_heads_major``: k/v arrive [B,Hkv,Lk,D] (the KV-cache layout)."""
    b, lq, h, d = q.shape
    lk, hkv = _kv_dims(k, kv_heads_major)
    if block_q is None:
        block_q = _fwd_block_q(lq, lk)
    kscale = d ** -0.5 * 1.4426950408889634  # scale * log2(e)
    # kernel D = whatever k/v carry: the KV cache arrives lane-padded
    # (KVCache docstring) so the pads below are no-ops on it and the scan
    # consumes it copy-free; uncached callers pass D as-is (a full-dim
    # block is legal at any size — Mosaic masks the MXU lanes)
    dp = k.shape[-1]
    block_q = min(block_q, _round_up(lq, 8))
    lqp = _round_up(lq, block_q)
    lkp = _round_up(lk, 128)
    group = h // hkv

    qt = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    kt = _kv_hm(k, kv_heads_major)
    vt = _kv_hm(v, kv_heads_major)
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - kt.shape[-1])))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - vt.shape[-1])))
    # padded keys never visible; padded queries see everything (rows cropped)
    rank = jnp.pad(mask.rank, ((0, 0), (0, lkp - lk)),
                   constant_values=2**30)[:, None, :]
    qoff = jnp.pad(mask.q_off, ((0, 0), (0, lqp - lq)),
                   constant_values=2**30)[:, :, None]   # [B, Lqp, 1]

    grid = (b, h, lqp // block_q)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, kscale=kscale,
                          nsub=_decode_pipe_nsub()),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 1), lambda bi, hi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lkp), lambda bi, hi, qi: (bi, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * lkp * dp,
            bytes_accessed=(qt.size + kt.size + vt.size
                            + b * h * lqp * dp) * qt.dtype.itemsize,
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=interpret or INTERPRET,
    )(qoff, rank, qt, kt, vt)
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3)


def _stream_decode_kernel(qoff_ref, rank_ref, q_ref, k_ref, v_ref, o_ref,
                          l_scr, acc_scr, *, kscale: float):
    """k-STREAMING decode kernel for >8k-key windows (long rollouts):
    grid (B, H, q-blocks, k-blocks), k innermost, only a [bq, bk] score
    tile in VMEM — length-unbounded. The unshifted-exp2 trick of
    :func:`_decode_kernel` pays off double here: with no running max there
    is no alpha-rescaling pass per tile either — the recurrence is just
    l += sum(p); acc += p@v in f32 (sums of exp2(clip(s,±100)) over any
    realistic Lk stay far inside f32 range)."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                    # [bq, Dp]
    k = k_ref[0, 0]                    # [bk, Dp]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * kscale
    qoff = qoff_ref[0]                 # [bq, 1] int32 (sublane layout)
    rank = rank_ref[0, 0][None, :]     # [1, bk]
    p = jnp.where(qoff >= rank,
                  jnp.exp2(jnp.clip(s, -100.0, 100.0)), 0.0)
    l_scr[:] = l_scr[:] + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_scr.shape)
    acc_scr[:] = acc_scr[:] + jnp.dot(p.astype(v.dtype), v,
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def flash_mha_decode_streaming(q, k, v, mask: DecodeMask,
                               block_q: int = 2048, block_k: int = 512,
                               interpret: bool = False,
                               kv_heads_major: bool = False) -> jax.Array:
    """Length-unbounded columnar-rank decode (fwd-only): the resident
    :func:`flash_mha_decode` caps at ~8k keys (full key row in VMEM); this
    streams k-tiles for the 80-frame-window rollouts (Lk to ~24k) where
    the inference layouts collapse to a per-key rank.

    block_q default 2048: each q-block re-streams the whole K/V row from
    HBM, so tall q-blocks cut the dominant DMA term ~linearly; measured
    21.7 -> 19.4 ms/layer at the 240x320 block-1 rollout shape
    (Lq 7248, Lk 16912; scripts/kernel_sweep.py on v5e)."""
    b, lq, h, d = q.shape
    lk, hkv = _kv_dims(k, kv_heads_major)
    kscale = d ** -0.5 * 1.4426950408889634  # scale * log2(e)
    dp = k.shape[-1]
    bq = min(_stream_block_q(lq, block_q), _round_up(lq, 8))
    lqp = _round_up(lq, bq)
    bk = min(block_k, _round_up(lk, 128))
    lkp = _round_up(lk, bk)
    group = h // hkv

    qt = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    kt = _kv_hm(k, kv_heads_major)
    vt = _kv_hm(v, kv_heads_major)
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - kt.shape[-1])))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - vt.shape[-1])))
    rank = jnp.pad(mask.rank, ((0, 0), (0, lkp - lk)),
                   constant_values=2**30)[:, None, :]
    qoff = jnp.pad(mask.q_off, ((0, 0), (0, lqp - lq)),
                   constant_values=2**30)[:, :, None]   # [B, Lqp, 1]

    grid = (b, h, lqp // bq, lkp // bk)
    out = pl.pallas_call(
        functools.partial(_stream_decode_kernel, kscale=kscale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 1), lambda bi, hi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda bi, hi, qi, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dp),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dp),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # running denominator
            pltpu.VMEM((bq, dp), jnp.float32),    # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * lkp * dp,
            bytes_accessed=(qt.size + kt.size + vt.size
                            + b * h * lqp * dp) * qt.dtype.itemsize,
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=interpret or INTERPRET,
    )(qoff, rank, qt, kt, vt)
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3)


def _decode_split_kernel(qoff_ref, rankc_ref, rankt_ref, q_ref,
                         kc_ref, vc_ref, kt_ref, vt_ref, o_ref, *,
                         kscale: float, nsub: int = 1):
    """:func:`_decode_kernel` with SEPARATE cache/tail key operands.

    The denoise scan's per-layer ``concat([cache, new_kv])`` costs a full
    cache copy per layer per step (~8ms/step at flagship shapes, and 2x the
    cache's HBM working set); feeding the kernel both operands directly
    makes the step zero-copy — the unshifted-exp2 softmax sums and the
    output accumulator simply add across the two score tiles.

    ``nsub``>1 subtiles each operand and runs the software-pipelined body
    (:func:`_pipelined_rank_attn`) over the cache chunks then tail chunks;
    the cache/tail boundary is already a chunk boundary, so the math stays
    bit-identical."""
    q = q_ref[0, 0]                    # [bq, Dp]
    qoff = qoff_ref[0]                 # [bq, 1] int32 (sublane layout)
    if nsub > 1:
        chunks = (_subtile_chunks(kc_ref[0, 0], vc_ref[0, 0],
                                  rankc_ref[0, 0], nsub)
                  + _subtile_chunks(kt_ref[0, 0], vt_ref[0, 0],
                                    rankt_ref[0, 0], nsub))
        l, acc = _pipelined_rank_attn(q, qoff, chunks, kscale)
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return
    sc = jax.lax.dot_general(
        q, kc_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * kscale
    pc = jnp.where(qoff >= rankc_ref[0, 0][None, :],
                   jnp.exp2(jnp.clip(sc, -100.0, 100.0)), 0.0)
    st = jax.lax.dot_general(
        q, kt_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * kscale
    pt = jnp.where(qoff >= rankt_ref[0, 0][None, :],
                   jnp.exp2(jnp.clip(st, -100.0, 100.0)), 0.0)
    l = jnp.maximum(jnp.sum(pc, axis=-1, keepdims=True)
                    + jnp.sum(pt, axis=-1, keepdims=True), 1e-30)
    acc = (jnp.dot(pc.astype(vc_ref.dtype), vc_ref[0, 0],
                   preferred_element_type=jnp.float32)
           + jnp.dot(pt.astype(vt_ref.dtype), vt_ref[0, 0],
                     preferred_element_type=jnp.float32))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _split_operands(q, k_cache, k_new, mask, block_q, block_kc=None):
    """Shared padding/layout for the split decode kernels. Returns
    (geometry, qoff [B,Lqp,1], rank_c [B,1,Lcp], rank_t [B,1,Ltp])."""
    b, lq, h, d = q.shape
    lc, lt = k_cache.shape[2], k_new.shape[2]
    dp = k_cache.shape[-1]
    bq = min(block_q, _round_up(lq, 8))
    lqp = _round_up(lq, bq)
    unit_c = block_kc if block_kc is not None else 128
    unit_t = block_kc if block_kc is not None else 128
    lcp = _round_up(lc, unit_c)
    ltp = _round_up(lt, unit_t)
    qoff = jnp.pad(mask.q_off, ((0, 0), (0, lqp - lq)),
                   constant_values=2**30)[:, :, None]
    rank_c = jnp.pad(mask.rank[:, :lc], ((0, 0), (0, lcp - lc)),
                     constant_values=2**30)[:, None, :]
    rank_t = jnp.pad(mask.rank[:, lc:], ((0, 0), (0, ltp - lt)),
                     constant_values=2**30)[:, None, :]
    return (b, lq, h, d, lc, lt, dp, bq, lqp, lcp, ltp), qoff, rank_c, rank_t


def _pad_hm(x, lp):
    """Pad a heads-major [B, Hkv, L, Dp] operand to L=lp."""
    return jnp.pad(x, ((0, 0), (0, 0), (0, lp - x.shape[2]), (0, 0)))


def flash_mha_decode_split(q, k_cache, v_cache, k_new, v_new,
                           mask: DecodeMask,
                           block_q: Optional[int] = None,
                           interpret: bool = False) -> jax.Array:
    """Resident columnar-rank decode with separate cache/tail operands.

    q [B,Lq,H,D]; k/v_cache [B,Hkv,Lc,Dp] (the at-rest KVCache layout,
    lane-padded); k/v_new [B,Hkv,Lt,Dp] (the current tokens, as emitted by
    the attention layer). ``mask.rank`` covers the concatenated key space
    [B, Lc+Lt] in cache-then-tail order. Bit-identical math to
    :func:`flash_mha_decode` over ``concat([cache, new], axis=2)`` — minus
    the concat copy (see ``_decode_split_kernel``)."""
    b, lq, h, d = q.shape
    if block_q is None:
        block_q = _fwd_block_q(lq, k_cache.shape[2] + k_new.shape[2])
    kscale = d ** -0.5 * 1.4426950408889634
    (b, lq, h, d, lc, lt, dp, bq, lqp, lcp, ltp), qoff, rank_c, rank_t = \
        _split_operands(q, k_cache, k_new, mask, block_q)
    group = h // k_cache.shape[1]
    qt = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    kc, vc = _pad_hm(k_cache, lcp), _pad_hm(v_cache, lcp)
    kt, vt = _pad_hm(k_new, ltp), _pad_hm(v_new, ltp)

    grid = (b, h, lqp // bq)
    out = pl.pallas_call(
        functools.partial(_decode_split_kernel, kscale=kscale,
                          nsub=_decode_pipe_nsub()),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 1), lambda bi, hi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lcp), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ltp), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dp), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lcp, dp),
                         lambda bi, hi, qi: (bi, hi // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lcp, dp),
                         lambda bi, hi, qi: (bi, hi // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ltp, dp),
                         lambda bi, hi, qi: (bi, hi // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ltp, dp),
                         lambda bi, hi, qi: (bi, hi // group, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dp),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * (lcp + ltp) * dp,
            bytes_accessed=(qt.size + kc.size + vc.size + kt.size + vt.size
                            + b * h * lqp * dp) * qt.dtype.itemsize,
            transcendentals=b * h * lqp * (lcp + ltp),
        ),
        interpret=interpret or INTERPRET,
    )(qoff, rank_c, rank_t, qt, kc, vc, kt, vt)
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3)


def _stream_decode_split_kernel(qoff_ref, rankc_ref, rankt_ref, q_ref,
                                kc_ref, vc_ref, kt_ref, vt_ref, o_ref,
                                l_scr, acc_scr, *, kscale: float, nkc: int,
                                nsub: int = 1):
    """:func:`_stream_decode_kernel` with separate cache/tail operands: the
    k-grid runs over cache tiles then tail tiles; each iteration SELECTS the
    active tile pair with a VPU ``where`` (both tiles sit in VMEM; the
    inactive ref's index map holds its block constant so Pallas skips its
    DMA). No concatenated K/V array ever exists in HBM."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    qoff = qoff_ref[0]

    def accumulate(k_ref2, v_ref2, rank_ref2):
        # optional in-tile software pipeline (VGT_STREAM_NSUB>1): chunk
        # j+1's QK dot issued before chunk j's exp2 — independent MXU/VPU
        # chains for the scheduler; bit-identical accumulation
        l, acc = _pipelined_rank_attn(
            q, qoff,
            _subtile_chunks(k_ref2[0, 0], v_ref2[0, 0], rank_ref2[0, 0],
                            nsub), kscale)
        l_scr[:] = l_scr[:] + jnp.broadcast_to(l, l_scr.shape)
        acc_scr[:] = acc_scr[:] + acc

    # the cache/tail predicate is grid-static: branch with pl.when instead
    # of jnp.where so the inactive operand costs nothing (the old
    # whole-tile selects were three extra VPU passes per iteration)
    @pl.when(ki < nkc)
    def _():
        accumulate(kc_ref, vc_ref, rankc_ref)

    @pl.when(ki >= nkc)
    def _():
        accumulate(kt_ref, vt_ref, rankt_ref)

    @pl.when(ki == nk - 1)
    def _():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def flash_mha_decode_streaming_split(q, k_cache, v_cache, k_new, v_new,
                                     mask: DecodeMask,
                                     block_q: int = 2048, block_k: int = 512,
                                     interpret: bool = False) -> jax.Array:
    """Length-unbounded split-operand decode (long-rollout windows): the
    concat the split removes is at its largest here — 2 x [B,Hkv,Lk,Dp]
    fresh HBM copies per layer per step at Lk up to ~18k keys.

    block_q default 2048: see :func:`flash_mha_decode_streaming` (tall
    q-blocks amortise the per-q-block K/V re-stream; measured best of a
    {256..2048}^2 sweep at the block-1 rollout shape)."""
    b, lq, h, d = q.shape
    kscale = d ** -0.5 * 1.4426950408889634
    bq0 = min(_stream_block_q(lq, block_q), _round_up(lq, 8))
    bk = min(block_k,
             max(_round_up(k_cache.shape[2], 128),
                 _round_up(k_new.shape[2], 128)))
    (b, lq, h, d, lc, lt, dp, bq, lqp, lcp, ltp), qoff, rank_c, rank_t = \
        _split_operands(q, k_cache, k_new, mask, bq0, block_kc=bk)
    group = h // k_cache.shape[1]
    qt = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    kc, vc = _pad_hm(k_cache, lcp), _pad_hm(v_cache, lcp)
    kt, vt = _pad_hm(k_new, ltp), _pad_hm(v_new, ltp)
    nkc, nkt = lcp // bk, ltp // bk

    grid = (b, h, lqp // bq, nkc + nkt)

    # inactive ref holds its last/first block -> Pallas elides its DMA
    def ci(ki):
        return jnp.minimum(ki, nkc - 1)

    def ti(ki):
        return jnp.maximum(ki - nkc, 0)
    out = pl.pallas_call(
        functools.partial(_stream_decode_split_kernel, kscale=kscale,
                          nkc=nkc,
                          nsub=max(int(os.environ.get(
                              "VGT_STREAM_NSUB", "1")), 1)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 1), lambda bi, hi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk),
                         lambda bi, hi, qi, ki: (bi, 0, ci(ki)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk),
                         lambda bi, hi, qi, ki: (bi, 0, ti(ki)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dp),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ci(ki), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ci(ki), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ti(ki), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ti(ki), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dp),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, dp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * (lcp + ltp) * dp,
            bytes_accessed=(qt.size + kc.size + vc.size + kt.size + vt.size
                            + b * h * lqp * dp) * qt.dtype.itemsize,
            transcendentals=b * h * lqp * (lcp + ltp),
        ),
        interpret=interpret or INTERPRET,
    )(qoff, rank_c, rank_t, qt, kc, vc, kt, vt)
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3)


def _stream_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref,
                   m_scr, l_scr, acc_scr, *, scale: float):
    """Online-softmax streaming forward: grid (B, H, q-blocks, k-blocks),
    k innermost; running max/denominator/accumulator live in VMEM scratch.
    No full key row ever resides in VMEM, so sequence length is unbounded
    (the classic flash recurrence; cf.
    jax.experimental.pallas.ops.tpu.flash_attention)."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                    # [bq, Dp]
    k = k_ref[0, 0]                    # [bk, Dp]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0].astype(jnp.float32)          # [bq, bk]

    m_prev = m_scr[:, :1]                            # [bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _flash_streaming_fwd(q, k, v, bias, block_q=None, block_k=512,
                         kv_heads_major: bool = False):
    b, lq, h, d = q.shape
    lk, hkv = _kv_dims(k, kv_heads_major)
    scale = d ** -0.5
    dp = _round_up(d, 128)
    if block_q is None:
        # big q-blocks: K/V HBM traffic scales with the q-block count, and
        # the per-tile VMEM footprint here is small ([bq, bk] scores only).
        # 960/1024 divide the bias paddings (multiples of 96/256).
        rows = _round_up(lq, _fwd_block_q(lq, lk))
        block_q = next((c for c in (1024, 896, 768, 640, 512, 384, 256, 128)
                        if rows % c == 0), _fwd_block_q(lq, lk))
    bq = min(block_q, _round_up(lq, 8))
    lqp = _round_up(lq, bq)
    bk = min(block_k, _round_up(lk, 128))
    lkp = _round_up(lk, bk)
    group = h // hkv

    qt = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    # heads-major k/v arrive lane-padded to dp (KVCache): D pads are no-ops
    kt = _kv_hm(k, kv_heads_major)
    vt = _kv_hm(v, kv_heads_major)
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - kt.shape[-1])))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - vt.shape[-1])))
    if bias.shape[1] < lqp or bias.shape[2] < lkp \
            or bias.shape[1] % bq or bias.shape[2] % bk:
        bias = jnp.pad(
            bias[:, :lq, :lk],
            ((0, 0), (0, lqp - lq), (0, lkp - lk)),
            constant_values=BF16_NEG)  # padded keys invisible

    grid = (b, h, lqp // bq, lkp // bk)
    out = pl.pallas_call(
        functools.partial(_stream_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, bk),
                         lambda bi, hi, qi, ki: (bi, qi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, dp),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dp),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # running max
            pltpu.VMEM((bq, 128), jnp.float32),   # running denominator
            pltpu.VMEM((bq, dp), jnp.float32),    # output accumulator
        ],
        interpret=INTERPRET,
    )(bias, qt, kt, vt)
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3)


def _inline_visible(refs, shape, ki_offset, lk_real):
    """Evaluate the frame-block visibility rule for one [bq, bk] tile from
    the seven per-token metadata refs (shared by the streaming forward and
    both streaming backward kernels)."""
    (q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
     vis_ref, k_blk_ref, k_role_ref) = refs
    q_idx = q_idx_ref[0, 0][:, None]
    q_blk = q_blk_ref[0, 0][:, None]
    q_off = q_off_ref[0, 0][:, None]
    q_pad = q_pad_ref[0, 0][:, None]
    vis = vis_ref[0, 0][None, :]
    k_blk = k_blk_ref[0, 0][None, :]
    k_role = k_role_ref[0, 0][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + ki_offset
    return (q_idx >= vis) | (
        (k_blk >= 0) & (k_blk == q_blk) & (q_off >= k_role)) | (
        (q_pad > 0) & (col < lk_real))


def _inline_visible_t(refs, shape, ki_offset, lk_real):
    """Transposed-orientation ([bk, bq]: k rows, q columns) variant for the
    dK/dV kernel — Mosaic cannot transpose a bool tile, so the rule is
    evaluated directly in the layout it is consumed in."""
    (q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
     vis_ref, k_blk_ref, k_role_ref) = refs
    q_idx = q_idx_ref[0, 0][None, :]
    q_blk = q_blk_ref[0, 0][None, :]
    q_off = q_off_ref[0, 0][None, :]
    q_pad = q_pad_ref[0, 0][None, :]
    vis = vis_ref[0, 0][:, None]
    k_blk = k_blk_ref[0, 0][:, None]
    k_role = k_role_ref[0, 0][:, None]
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + ki_offset
    return (q_idx >= vis) | (
        (k_blk >= 0) & (k_blk == q_blk) & (q_off >= k_role)) | (
        (q_pad > 0) & (row < lk_real))


def _stream_inline_kernel(q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
                          vis_ref, k_blk_ref, k_role_ref,
                          q_ref, k_ref, v_ref, o_ref, lse_ref,
                          m_scr, l_scr, acc_scr, *,
                          scale: float, lk_real: int, block_k: int):
    """Streaming forward with the visibility rule evaluated per tile from
    metadata — no [Lq, Lk] bias in HBM, so sequence length is bounded only
    by HBM for K/V themselves. Also emits the per-row logsumexp residual
    the streaming backward kernels recompute probabilities from."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    visible = _inline_visible(
        (q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
         vis_ref, k_blk_ref, k_role_ref), s.shape, ki * block_k, lk_real)
    s = jnp.where(visible, s, -1e30)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_scr[:] = jnp.broadcast_to(
        l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
        l_scr.shape)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == nk - 1)
    def _():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:, 0] + jnp.log(denom[:, 0])


def _stream_geometry(q, k, block_q, block_k, kv_heads_major: bool = False):
    b, lq, h, d = q.shape
    lk, hkv = _kv_dims(k, kv_heads_major)
    dp = _round_up(d, 128)
    bq = min(block_q, _round_up(lq, 8))
    lqp = _round_up(lq, bq)
    bk = min(block_k, _round_up(lk, 128))
    lkp = _round_up(lk, bk)
    return b, lq, h, d, lk, hkv, dp, bq, lqp, bk, lkp


def _stream_pad_inputs(q, k, v, q_meta, k_meta, lqp, lkp, dp,
                       kv_heads_major: bool = False):
    d = q.shape[-1]
    lq = q.shape[1]
    lk, _ = _kv_dims(k, kv_heads_major)
    qt = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    # heads-major k/v arrive lane-padded to dp (KVCache): D pads are no-ops
    kt = _kv_hm(k, kv_heads_major)
    vt = _kv_hm(v, kv_heads_major)
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - kt.shape[-1])))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - vt.shape[-1])))

    def padq(x, fill):
        return jnp.pad(x, ((0, 0), (0, lqp - lq)),
                       constant_values=fill)[:, None, :]

    def padk(x, fill):
        return jnp.pad(x, ((0, 0), (0, lkp - lk)),
                       constant_values=fill)[:, None, :]

    meta_in = (padq(q_meta.index, 0), padq(q_meta.q_block, -2),
               padq(q_meta.q_offset, 0), padq(q_meta.is_pad, 1),
               padk(k_meta.vis_start, 2**30),
               padk(k_meta.noisy_block, -1), padk(k_meta.noisy_role, 0))
    return qt, kt, vt, meta_in


def _stream_inline_fwd(q, k, v, q_meta: AttnMeta, k_meta: AttnMeta,
                       block_q: int = 512, block_k: int = 512,
                       kv_heads_major: bool = False):
    """Metadata streaming forward; returns (out, lse [B, H, Lqp] f32)."""
    (b, lq, h, d, lk, hkv, dp, bq, lqp, bk, lkp) = _stream_geometry(
        q, k, block_q, block_k, kv_heads_major)
    scale = d ** -0.5
    group = h // hkv
    qt, kt, vt, meta_in = _stream_pad_inputs(q, k, v, q_meta, k_meta,
                                             lqp, lkp, dp, kv_heads_major)
    grid = (b, h, lqp // bq, lkp // bk)

    def qmeta_spec():
        return pl.BlockSpec((1, 1, bq), lambda bi, hi, qi, ki: (bi, 0, qi),
                            memory_space=pltpu.VMEM)

    def kmeta_spec():
        return pl.BlockSpec((1, 1, bk), lambda bi, hi, qi, ki: (bi, 0, ki),
                            memory_space=pltpu.VMEM)

    out, lse = pl.pallas_call(
        functools.partial(_stream_inline_kernel, scale=scale, lk_real=lk,
                          block_k=bk),
        grid=grid,
        in_specs=[qmeta_spec()] * 4 + [kmeta_spec()] * 3 + [
            pl.BlockSpec((1, 1, bq, dp),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dp),
                         lambda bi, hi, qi, ki: (bi, hi // group, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, dp),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            # [B*H, 1, Lqp]: middle dim equals the array dim, satisfying the
            # TPU block-shape rule (same trick as the 1-D metadata inputs)
            pl.BlockSpec((1, 1, bq),
                         lambda bi, hi, qi, ki, h=h: (bi * h + hi, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lqp, dp), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, lqp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, dp), jnp.float32),
        ],
        interpret=INTERPRET,
    )(*meta_in, qt, kt, vt)
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3), lse


def _stream_dq_kernel(q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
                      vis_ref, k_blk_ref, k_role_ref,
                      q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, *, scale: float, lk_real: int, block_k: int):
    """dQ: grid (B, H, q-blocks, k-blocks), k innermost; p recomputed from
    the forward's logsumexp, dq accumulated in the revisited f32 out block
    (the FlashAttention-2 backward, with the mask evaluated from metadata)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    visible = _inline_visible(
        (q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
         vis_ref, k_blk_ref, k_role_ref), s.shape, ki * block_k, lk_real)
    s = jnp.where(visible, s, -1e30)
    p = jnp.exp(s - lse)                          # masked entries underflow
    dp_ = jax.lax.dot_general(do, v.astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = p * (dp_ - delta) * scale
    dq_ref[0, 0] += jnp.dot(ds, k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)


def _stream_dkv_kernel(q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
                       vis_ref, k_blk_ref, k_role_ref,
                       q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dk_ref, dv_ref, *, scale: float, lk_real: int,
                       block_k: int):
    """dK/dV: grid (B, H_kv, k-blocks, group*q-blocks), the innermost dim
    walking every (q-head-in-group, q-block) pair; transposed scores
    [bk, bq] so dk/dv accumulate in revisited f32 out blocks — the
    cross-head accumulation GQA needs falls out of the same
    revisited-block pattern (MHA is the group=1 special case)."""
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][None, :]                  # [1, bq]
    delta = delta_ref[0, 0][None, :]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    ki = pl.program_id(2)
    visible = _inline_visible_t(
        (q_idx_ref, q_blk_ref, q_off_ref, q_pad_ref,
         vis_ref, k_blk_ref, k_role_ref), st.shape, ki * block_k, lk_real)
    st = jnp.where(visible, st, -1e30)
    pt = jnp.exp(st - lse)                        # [bk, bq]
    dv_ref[0, 0] += jnp.dot(pt, do, preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(v.astype(jnp.float32), do,
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dst = pt * (dpt - delta) * scale
    dq_dtype = jnp.float32
    dk_ref[0, 0] += jnp.dot(dst, q.astype(dq_dtype),
                            preferred_element_type=jnp.float32)


def _stream_inline_bwd_impl(q, k, v, o, lse, do, q_meta, k_meta,
                            block_q: int = 512, block_k: int = 512):
    (b, lq, h, d, lk, hkv, dp, bq, lqp, bk, lkp) = _stream_geometry(
        q, k, block_q, block_k)
    group = h // hkv
    scale = d ** -0.5
    qt, kt, vt, meta_in = _stream_pad_inputs(q, k, v, q_meta, k_meta,
                                             lqp, lkp, dp)
    dot_ = jnp.pad(do.transpose(0, 2, 1, 3),
                   ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    # delta = rowsum(dO * O), computed once in XLA (fuses with the pad);
    # [B*H, 1, Lqp] like lse (see the block-shape note in the forward)
    delta = jnp.pad(
        jnp.einsum("blhd,blhd->bhl", do.astype(jnp.float32),
                   o.astype(jnp.float32)),
        ((0, 0), (0, 0), (0, lqp - lq))).reshape(b * h, 1, lqp)

    def qmeta4(axis_q):
        return pl.BlockSpec((1, 1, bq),
                            lambda bi, hi, i, j, axis_q=axis_q:
                            (bi, 0, i if axis_q == 2 else j),
                            memory_space=pltpu.VMEM)

    def kmeta4(axis_k):
        return pl.BlockSpec((1, 1, bk),
                            lambda bi, hi, i, j, axis_k=axis_k:
                            (bi, 0, i if axis_k == 2 else j),
                            memory_space=pltpu.VMEM)

    def qrow4(axis_q):
        return pl.BlockSpec((1, 1, bq),
                            lambda bi, hi, i, j, axis_q=axis_q, h=h:
                            (bi * h + hi, 0, i if axis_q == 2 else j),
                            memory_space=pltpu.VMEM)

    def qblk4(axis_q):
        return pl.BlockSpec((1, 1, bq, dp),
                            lambda bi, hi, i, j, axis_q=axis_q:
                            (bi, hi, i if axis_q == 2 else j, 0),
                            memory_space=pltpu.VMEM)

    def kblk4(axis_k):
        # K/V are per KV-HEAD: the dQ grid's head dim is a q-head, so the
        # block picks the kv head at hi // group (MHA: group == 1)
        return pl.BlockSpec((1, 1, bk, dp),
                            lambda bi, hi, i, j, axis_k=axis_k:
                            (bi, hi // group,
                             i if axis_k == 2 else j, 0),
                            memory_space=pltpu.VMEM)

    # dQ: q-blocks outer, k-blocks inner
    dq = pl.pallas_call(
        functools.partial(_stream_dq_kernel, scale=scale, lk_real=lk,
                          block_k=bk),
        grid=(b, h, lqp // bq, lkp // bk),
        in_specs=[qmeta4(2)] * 4 + [kmeta4(3)] * 3
        + [qblk4(2), kblk4(3), kblk4(3), qblk4(2), qrow4(2), qrow4(2)],
        out_specs=qblk4(2),
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, dp), jnp.float32),
        interpret=INTERPRET,
    )(*meta_in, qt, kt, vt, dot_, lse, delta)

    # dK/dV: grid (B, H_kv, k-blocks, group * q-blocks) — the innermost
    # dim walks every (q-head-in-group, q-block) pair, accumulating the
    # GQA cross-head sum into the revisited per-kv-head f32 out blocks.
    # j // nq selects the q-head within the group; j % nq the q-block.
    nq = lqp // bq

    def qmeta_g():
        return pl.BlockSpec((1, 1, bq),
                            lambda bi, hi, i, j: (bi, 0, j % nq),
                            memory_space=pltpu.VMEM)

    def kmeta_g():
        return pl.BlockSpec((1, 1, bk), lambda bi, hi, i, j: (bi, 0, i),
                            memory_space=pltpu.VMEM)

    def qblk_g():
        return pl.BlockSpec((1, 1, bq, dp),
                            lambda bi, hi, i, j:
                            (bi, hi * group + j // nq, j % nq, 0),
                            memory_space=pltpu.VMEM)

    def qrow_g():
        return pl.BlockSpec((1, 1, bq),
                            lambda bi, hi, i, j, h=h:
                            (bi * h + hi * group + j // nq, 0, j % nq),
                            memory_space=pltpu.VMEM)

    def kblk_g():
        return pl.BlockSpec((1, 1, bk, dp),
                            lambda bi, hi, i, j: (bi, hi, i, 0),
                            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_stream_dkv_kernel, scale=scale, lk_real=lk,
                          block_k=bk),
        grid=(b, hkv, lkp // bk, group * nq),
        in_specs=[qmeta_g()] * 4 + [kmeta_g()] * 3
        + [qblk_g(), kblk_g(), kblk_g(), qblk_g(), qrow_g(), qrow_g()],
        out_specs=(kblk_g(), kblk_g()),
        out_shape=(jax.ShapeDtypeStruct((b, hkv, lkp, dp), jnp.float32),
                   jax.ShapeDtypeStruct((b, hkv, lkp, dp), jnp.float32)),
        interpret=INTERPRET,
    )(*meta_in, qt, kt, vt, dot_, lse, delta)

    dq = dq[:, :, :lq, :d].transpose(0, 2, 1, 3).astype(q.dtype)
    dk = dk[:, :, :lk, :d].transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dv[:, :, :lk, :d].transpose(0, 2, 1, 3).astype(v.dtype)
    return dq, dk, dv


@jax.custom_vjp
def _stream_inline_vjp(q, k, v, *meta):
    qm, km = AttnMeta(*meta[:7]), AttnMeta(*meta[7:])
    return _stream_inline_fwd(q, k, v, qm, km)[0]


def _stream_inline_vjp_fwd(q, k, v, *meta):
    qm, km = AttnMeta(*meta[:7]), AttnMeta(*meta[7:])
    o, lse = _stream_inline_fwd(q, k, v, qm, km)
    return o, (q, k, v, o, lse, meta)


def _stream_inline_vjp_bwd(res, do):
    q, k, v, o, lse, meta = res
    qm, km = AttnMeta(*meta[:7]), AttnMeta(*meta[7:])
    dq, dk, dv = _stream_inline_bwd_impl(q, k, v, o, lse, do, qm, km)
    return (dq, dk, dv) + (None,) * len(meta)


_stream_inline_vjp.defvjp(_stream_inline_vjp_fwd, _stream_inline_vjp_bwd)


def flash_mha_streaming_inline(q, k, v, q_meta: AttnMeta, k_meta: AttnMeta):
    """Length-unbounded metadata streaming attention, DIFFERENTIABLE: the
    backward is the streaming Pallas pair (dq; dk/dv) with O(L) mask memory
    — stage-2/3/4 training lengths never materialise a dense bias
    (cf. pretrain_stage4_nv.sh:41-42: 80 frames, max_input_length 1.28M)."""
    return _stream_inline_vjp(q, k, v, *tuple(q_meta), *tuple(k_meta))


@jax.custom_vjp
def flash_mha_streaming(q, k, v, bias):
    """Length-unbounded streaming attention with a precomputed bias.
    Large q-blocks keep K/V re-reads low (traffic scales with the q-block
    count). Differentiable: the backward recomputes through the memory-bounded
    chunked jnp path (the resident Pallas backward caps at 8k keys)."""
    return _flash_streaming_fwd(q, k, v, bias)


def _streaming_vjp_fwd(q, k, v, bias):
    return _flash_streaming_fwd(q, k, v, bias), (q, k, v, bias)


def _streaming_vjp_bwd(res, do):
    from .attention import mha_chunked

    q, k, v, bias = res
    lq, lk = q.shape[1], k.shape[1]
    dense_bias = bias[None, :, :lq, :lk].swapaxes(0, 1)  # [B,1,Lq,Lk]
    _, pullback = jax.vjp(
        lambda q, k, v: mha_chunked(q, k, v, dense_bias), q, k, v)
    return pullback(do) + (None,)


flash_mha_streaming.defvjp(_streaming_vjp_fwd, _streaming_vjp_bwd)


def flash_attention_supported(q, k, v, kv_heads_major: bool = False) -> bool:
    if not INTERPRET:  # interpret mode runs anywhere (CPU tests / dryrun)
        try:
            platform = q.devices().pop().platform if hasattr(q, "devices") \
                else jax.default_backend()
        except Exception:
            platform = jax.default_backend()
        if platform != "tpu":
            return False
    b, lq, h, d = q.shape
    lk, hkv = _kv_dims(k, kv_heads_major)
    # full key rows live in VMEM: beyond ~8k keys the kernels cannot fit
    return h % hkv == 0 and d <= 128 and _round_up(lk, 128) <= 8192


def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array,
              q_meta: AttnMeta, k_meta: AttnMeta,
              bias: Optional[jax.Array] = None,
              block_q: Optional[int] = None,
              interpret: bool = False,
              kv_heads_major: bool = False) -> jax.Array:
    """q [B,Lq,H,D], k/v [B,Lk,Hkv,D] -> [B,Lq,H,D]. ``bias`` is the output
    of :func:`precompute_bias` (fast path); None selects the inline mode.
    ``kv_heads_major``: k/v arrive [B,Hkv,Lk,D] (the KV-cache layout)."""
    b, lq, h, d = q.shape
    lk, hkv = _kv_dims(k, kv_heads_major)
    if block_q is None:
        if bias is not None:
            block_q = _fwd_block_q(lq, lk)
        else:
            # inline mode carries extra metadata blocks: smaller tiles
            block_q = 128 if _round_up(lk, 128) <= 5504 else 64
    scale = d ** -0.5
    dp = _round_up(d, 128)
    block_q = min(block_q, _round_up(lq, 8))
    lqp = _round_up(lq, block_q)
    lkp = _round_up(lk, 128)

    qt = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    # heads-major k/v arrive lane-padded to dp already (KVCache docstring):
    # both pads below are then no-ops and the cache is consumed copy-free
    kt = _kv_hm(k, kv_heads_major)
    vt = _kv_hm(v, kv_heads_major)
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - kt.shape[-1])))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - vt.shape[-1])))
    group = h // hkv
    out_shape = jax.ShapeDtypeStruct((b, h, lqp, dp), q.dtype)
    cost = pl.CostEstimate(
        flops=4 * b * h * lqp * lkp * dp,
        bytes_accessed=(qt.size + kt.size + vt.size
                        + b * h * lqp * dp) * qt.dtype.itemsize,
        transcendentals=b * h * lqp * lkp,
    )

    if bias is not None:
        if (bias.shape[1] < lqp or bias.shape[1] % block_q
                or bias.shape[2] != lkp):
            # padded for an incompatible block size; copy (rare — the auto
            # block sizes keep forward/backward paddings mutually divisible)
            assert bias.shape[1] >= lq and bias.shape[2] >= lkp
            bias = jnp.pad(bias[:, :lq, :lkp],
                           ((0, 0), (0, lqp - lq), (0, 0)))
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
            interpret=interpret or INTERPRET,
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
        # f32 (not bf16): see the relayout note in _inline_kernel. VMEM cost
        # at the auto block sizes: 128x5504x4 = 2.8M (<=5504 keys) or
        # 64x8192x4 = 2M (beyond) — inside budget next to K/V.
        scratch_shapes=[pltpu.VMEM((block_q, lkp), jnp.float32)],
        interpret=interpret or INTERPRET,
        cost_estimate=cost,
    )(q_idx, q_blk, q_off, q_pad, vis, k_blk, k_role, qt, kt, vt)
    return out[:, :, :lq, :d].transpose(0, 2, 1, 3)
