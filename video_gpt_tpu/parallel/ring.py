"""Ring attention over the mesh's ``seq`` axis.

Blockwise alternative to Ulysses (parallel/ulysses.py): instead of two
all_to_alls that reshard seq<->heads, the K/V chunks (plus their key-side
mask metadata) hop around a ring of seq-axis neighbours
(``jax.lax.ppermute``) while every device keeps its own queries. Each hop
computes a partial softmax over one chunk and merges it into a running
(out, logsumexp) pair — the classic blockwise/ring attention recurrence.

Why it exists next to Ulysses (the reference's flagship strategy,
LVM/transform/sdpa_transform.py:126-159):

- SP degree is NOT capped by the head count (Ulysses shards heads, so
  sp <= 32 on Phi-3); a ring scales to any divisor of L — the fit for
  stage-4's 1.28M-token limit (pretrain_stage4_nv.sh:41-42).
- comm per layer is K+V once around the ring, one neighbour hop at a time
  (ICI-friendly, overlappable with the chunk compute) vs four all_to_alls.

The local per-chunk kernel is the metadata streaming pair
(`ops.flash_attention._stream_inline_fwd` / `_stream_inline_bwd_impl`) on
TPU — they already emit/consume the logsumexp residual a ring needs — and a
dense jnp partial elsewhere (CPU-mesh tests). The backward runs its own
ring: dK/dV accumulators travel WITH their chunk and arrive home after a
full cycle, while the global (out, lse, delta) make every per-chunk
gradient exact (FlashAttention-2 backward, chunked over devices).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.attention import AttnMeta, visibility
from .mesh import DATA_AXIS, SEQ_AXIS, TENSOR_AXIS
from .ulysses import active_seq_degree


def _dense_chunk_fwd(q, k, v, qm: AttnMeta, km: AttnMeta):
    """(out [B,Lq,H,D] normalised, lse [B,H,Lq] natural-log) over one
    chunk; fp32 math. Fully-masked rows get lse ~ -1e30 (weight ~0 in the
    merge)."""
    scale = q.shape[-1] ** -0.5
    h, hkv = q.shape[2], k.shape[2]
    kf, vf = k.astype(jnp.float32), v.astype(jnp.float32)
    if hkv != h:
        kf = jnp.repeat(kf, h // hkv, axis=2)
        vf = jnp.repeat(vf, h // hkv, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kf) * scale
    s = jnp.where(visibility(qm, km)[:, None], s, -1e30)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vf)
    o = o / l.transpose(0, 2, 1)[..., None]
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    return o, lse


def _dense_chunk_bwd(q, k, v, o, lse, do, qm: AttnMeta, km: AttnMeta):
    """Per-chunk dq/dk/dv from the GLOBAL (o, lse, do) — exact because
    p = exp(s - lse) are the global softmax probabilities."""
    scale = q.shape[-1] ** -0.5
    h, hkv = q.shape[2], k.shape[2]
    group = h // hkv
    kf, vf = k.astype(jnp.float32), v.astype(jnp.float32)
    if hkv != h:
        kf = jnp.repeat(kf, group, axis=2)
        vf = jnp.repeat(vf, group, axis=2)
    qf, of = q.astype(jnp.float32), o.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    s = jnp.where(visibility(qm, km)[:, None], s, -1e30)
    p = jnp.exp(s - lse[..., None])
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, dof)
    dp = jnp.einsum("bqhd,bkhd->bhqk", dof, vf)
    delta = jnp.sum(dof * of, axis=-1).transpose(0, 2, 1)  # [B,H,Lq]
    ds = p * (dp - delta[..., None]) * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
    if hkv != h:  # fold grouped-query grads back onto the kv heads
        b, lk = dk.shape[0], dk.shape[1]
        dk = dk.reshape(b, lk, hkv, group, -1).sum(axis=3)
        dv = dv.reshape(b, lk, hkv, group, -1).sum(axis=3)
    return dq, dk, dv


def _pallas_chunk_fwd(q, k, v, qm, km):
    from ..ops.flash_attention import _stream_inline_fwd
    b, lq, h, _ = q.shape
    o, lse = _stream_inline_fwd(q, k, v, qm, km)
    return o.astype(jnp.float32), lse.reshape(b, h, -1)[:, :, :lq]


def _pallas_chunk_bwd(q, k, v, o, lse, do, qm, km):
    from ..ops.flash_attention import _round_up, _stream_inline_bwd_impl
    b, lq, h, _ = q.shape
    bq = min(512, _round_up(lq, 8))
    lqp = _round_up(lq, bq)
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, lqp - lq))
                    ).reshape(b * h, 1, lqp)
    return _stream_inline_bwd_impl(q, k, v, o.astype(q.dtype), lse_p,
                                   do.astype(q.dtype), qm, km)


def _rotate(tree, sp):
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    return jax.tree.map(
        lambda x: jax.lax.ppermute(x, SEQ_AXIS, perm), tree)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ring(sp, use_pallas, q, k, v, *meta):
    out, _ = _ring_fwd_loop(sp, use_pallas, q, k, v, meta)
    return out


def _ring_fwd_loop(sp, use_pallas, q, k, v, meta):
    qm = AttnMeta(*meta[:7])
    km0 = tuple(meta[7:])
    chunk_fwd = _pallas_chunk_fwd if use_pallas else _dense_chunk_fwd
    b, lq, h, _ = q.shape

    def body(carry, _):
        k_c, v_c, km_c, o_acc, lse_acc = carry
        o_j, lse_j = chunk_fwd(q, k_c, v_c, qm, AttnMeta(*km_c))
        new_lse = jnp.logaddexp(lse_acc, lse_j)
        w_old = jnp.exp(lse_acc - new_lse).transpose(0, 2, 1)[..., None]
        w_new = jnp.exp(lse_j - new_lse).transpose(0, 2, 1)[..., None]
        o_acc = o_acc * w_old + o_j.astype(jnp.float32) * w_new
        k_c, v_c, km_c = _rotate((k_c, v_c, km_c), sp)
        return (k_c, v_c, km_c, o_acc, new_lse), None

    init = (k, v, km0,
            jnp.zeros((b, lq, h, q.shape[3]), jnp.float32),
            jnp.full((b, h, lq), -1e30, jnp.float32))
    (_, _, _, o, lse), _ = jax.lax.scan(body, init, None, length=sp)
    return o.astype(q.dtype), lse


def _ring_vjp_fwd(sp, use_pallas, q, k, v, *meta):
    out, lse = _ring_fwd_loop(sp, use_pallas, q, k, v, meta)
    return out, (q, k, v, out, lse, meta)


def _ring_vjp_bwd(sp, use_pallas, res, do):
    q, k, v, out, lse, meta = res
    qm = AttnMeta(*meta[:7])
    km0 = tuple(meta[7:])
    chunk_bwd = _pallas_chunk_bwd if use_pallas else _dense_chunk_bwd

    def body(carry, _):
        k_c, v_c, km_c, dk_c, dv_c, dq_acc = carry
        dq_j, dk_j, dv_j = chunk_bwd(q, k_c, v_c, out, lse, do, qm,
                                     AttnMeta(*km_c))
        dq_acc = dq_acc + dq_j.astype(jnp.float32)
        dk_c = dk_c + dk_j.astype(jnp.float32)
        dv_c = dv_c + dv_j.astype(jnp.float32)
        # dK/dV accumulators TRAVEL with their chunk: after the full cycle
        # (sp hops) each chunk's gradient lands back on its owner
        k_c, v_c, km_c, dk_c, dv_c = _rotate((k_c, v_c, km_c, dk_c, dv_c),
                                             sp)
        return (k_c, v_c, km_c, dk_c, dv_c, dq_acc), None

    init = (k, v, km0,
            jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32),
            jnp.zeros(q.shape, jnp.float32))
    (_, _, _, dk, dv, dq), _ = jax.lax.scan(body, init, None, length=sp)
    return (dq.astype(q.dtype), dk.astype(k.dtype),
            dv.astype(v.dtype)) + (None,) * len(meta)


_ring.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_attend(q, k, v, q_meta: AttnMeta, k_meta: AttnMeta,
                impl: str = "auto"):
    """Sequence-parallel ring attention over the ambient mesh (falls back
    to the plain local call off-mesh, like ulysses_attend)."""
    sp = active_seq_degree()
    if sp == 1:
        # tp-only meshes route through the head-parallel shard_map (ulysses
        # with sp=1 degenerates to exactly that); off-mesh it is the plain
        # local call
        from .ulysses import ulysses_attend
        return ulysses_attend(q, k, v, q_meta, k_meta, impl=impl)

    mesh = jax.sharding.get_abstract_mesh()
    b, lq, h, d = q.shape
    lk, hkv = k.shape[1], k.shape[2]
    tp = int(mesh.shape.get(TENSOR_AXIS, 1))
    if h % tp or hkv % tp:
        raise ValueError(f"heads ({h}/{hkv}) not divisible by tensor "
                         f"axis {tp}")
    if lq % sp or lk % sp:
        raise ValueError(f"ring SP={sp} needs sequence lengths divisible by "
                         f"the seq axis (got Lq={lq}, Lk={lk})")
    from ..ops.flash_attention import INTERPRET
    # GQA (hkv < h) runs the SAME streaming kernels: their K/V block specs
    # are natively grouped (flash_attention.py `hi // group` index maps)
    # and the dKV grid accumulates the cross-head sum per kv head
    use_pallas = (impl in ("auto", "pallas")
                  and (jax.default_backend() == "tpu" or INTERPRET)
                  and h % hkv == 0 and d <= 128)

    def inner(q, k, v, q_meta, k_meta):
        return _ring(sp, use_pallas, q, k, v, *tuple(q_meta),
                     *tuple(k_meta))

    from .mesh import maybe_axis
    qkv_spec = P(DATA_AXIS, SEQ_AXIS, maybe_axis(TENSOR_AXIS, mesh), None)
    meta_spec = lambda tree: jax.tree.map(
        lambda _: P(DATA_AXIS, SEQ_AXIS), tree)
    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec,
                  meta_spec(q_meta), meta_spec(k_meta)),
        out_specs=qkv_spec,
        check_vma=False,
    )(q, k, v, q_meta, k_meta)
