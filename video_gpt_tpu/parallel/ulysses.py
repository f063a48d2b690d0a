"""Ulysses sequence-parallel attention as a ``jax.shard_map``.

TPU-native replacement for the reference's monkey-patched DeepSpeed-Ulysses
attention (LVM/transform/sdpa_transform.py:126-159, fa_transform.py:134-175,
installed by ``replace_attention`` over every Phi3 attention module): the
sequence axis stays sharded through the whole network, and two
``jax.lax.all_to_all`` collectives swap shard axis seq<->heads around the
local attention call, so every head attends over the FULL sequence. XLA
schedules the collectives over ICI; the transpose rule of ``all_to_all``
makes the whole thing differentiable (the reference needs a hand-written
autograd.Function, sdpa_transform.py:104-124).

Layout contract (enforced, not silently fixed):
- q/k/v are [B, L, H, D] with L a multiple of the mesh's ``seq`` size and
  B a multiple of ``data`` (the collator pads to ``sp_multiple``, mirroring
  the reference's pad-to-SP rule, LVM/processor.py:783-809);
- H and H_kv are multiples of ``seq`` (Phi-3: 32/32);
- attention metadata is full-length per shard (O(L) int32 — cheap), so the
  local kernel sees global positions and the frame-block visibility rule
  needs no re-indexing.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, SEQ_AXIS, TENSOR_AXIS, maybe_axis


def active_seq_degree() -> int:
    """Size of the ambient mesh's ``seq`` axis (1 when no mesh is set)."""
    mesh = jax.sharding.get_abstract_mesh()
    try:
        return int(mesh.shape.get(SEQ_AXIS, 1))
    except Exception:
        return 1


def _tp_degree(mesh) -> int:
    """Size of the mesh's ``tensor`` axis (1 when absent): Megatron TP
    composes with Ulysses by ALSO sharding the head dims over 'tensor' —
    the a2a over 'seq' then swaps seq<->the LOCAL head block, so global
    head order is tensor-major, seq-chunk minor (exactly the KV-cache
    rest layout, mesh.constrain_cache)."""
    try:
        return int(mesh.shape.get(TENSOR_AXIS, 1))
    except Exception:
        return 1


# pad fills per AttnMeta field: padded QUERIES act as pad rows (cropped
# after), padded KEYS are never visible — same convention as the kernels'
# internal padding (ops/flash_attention._padded_visibility)
_META_FILLS = (0, 2**30, -1, 0, -2, 0, 1)


def _pad_meta(meta, pad: int):
    import jax.numpy as jnp
    from ..ops.attention import AttnMeta
    return AttnMeta(*(jnp.pad(x, ((0, 0), (0, pad)), constant_values=f)
                      for x, f in zip(meta, _META_FILLS)))


def _pad_decode_mask(mask, pad: int):
    import jax.numpy as jnp
    return type(mask)(
        rank=jnp.pad(mask.rank, ((0, 0), (0, pad)),
                     constant_values=2**30),      # padded keys invisible
        q_off=jnp.pad(mask.q_off, ((0, 0), (0, pad)),
                      constant_values=2**30))     # padded queries see all


def ulysses_attend_cached(q, k_new, v_new, cache_k, cache_v, q_meta, k_meta,
                          impl: str = "auto", bias=None):
    """Sequence-parallel CACHED decode/extend attention (inference SP —
    the reference serves with SP=4, inference_nv.sh:23).

    Layouts: ``q`` [B, Lq, H, D] seq-sharded; ``k_new``/``v_new`` the tail's
    K/V, heads-major lane-padded [B, Hkv, Lq, Dp], seq-sharded along L;
    ``cache_k``/``cache_v`` [B, Hkv, Lc, Dp] HEAD-sharded at rest — the
    prefix cache never crosses the interconnect after prefill. Per step,
    two all_to_alls swap only the TAIL to head-sharded, the local kernel
    sees its heads' full keys (cache ++ tail), and the output swaps back.
    """
    from ..ops.attention import attend
    import jax.numpy as jnp

    def local_fn(q, k, v, qm, km, b):
        return attend(q, k, v, qm, km, impl=impl, bias=b,
                      kv_heads_major=True)

    sp = active_seq_degree()
    mesh = jax.sharding.get_abstract_mesh()
    tp = _tp_degree(mesh)
    if sp == 1 and tp == 1:
        k = jnp.concatenate([cache_k.astype(k_new.dtype), k_new], axis=2)
        v = jnp.concatenate([cache_v.astype(v_new.dtype), v_new], axis=2)
        return local_fn(q, k, v, q_meta, k_meta, bias)

    b, lq, h, _ = q.shape
    hkv = k_new.shape[1]
    dp = int(mesh.shape.get(DATA_AXIS, 1))
    if h % (sp * tp) or hkv % (sp * tp):
        raise ValueError(f"heads ({h}/{hkv}) not divisible by "
                         f"seq*tensor = {sp}*{tp}")
    if b % dp:
        raise ValueError(f"batch {b} not divisible by data axis {dp}")
    pad = -lq % sp
    if pad:
        # inference layouts come at their natural lengths (e.g. a 222-token
        # one-frame tail): pad the TAIL to the seq multiple here — padded
        # queries are cropped below, padded keys are never visible
        if bias is not None and not hasattr(bias, "rank"):
            raise ValueError(
                "cannot pad a precomputed dense bias to the seq multiple; "
                "pass metadata or a DecodeMask (maybe_bias returns None "
                "under seq_shard)")
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k_new = jnp.pad(k_new, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_new = jnp.pad(v_new, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q_meta = _pad_meta(q_meta, pad)
        k_meta = _pad_meta(k_meta, pad)  # the tail sits at the END of Lk
        if bias is not None:
            bias = _pad_decode_mask(bias, pad)
    lq_out = lq
    lq = lq + pad

    a2a = functools.partial(jax.lax.all_to_all, axis_name=SEQ_AXIS,
                            tiled=True)

    def inner(q, kn, vn, ck, cv, q_meta, k_meta, bias):
        if sp > 1:
            q = a2a(q, split_axis=2, concat_axis=1)   # [b, Lq, h/(sp*tp), d]
            kn = a2a(kn, split_axis=1, concat_axis=2)  # [b, hkv/(sp*tp), Lq,]
            vn = a2a(vn, split_axis=1, concat_axis=2)
        if bias is not None and hasattr(bias, "rank"):
            # columnar decode: the split kernels consume the LOCAL cache and
            # tail as separate operands — no per-layer-per-step concat copy
            # of the sharded cache (same routing as the single-device path,
            # ops.attention.attend_decode_split; falls back internally off
            # the Pallas paths)
            from ..ops.attention import attend_decode_split
            out = attend_decode_split(q, ck, cv, kn, vn, q_meta, k_meta,
                                      bias, impl=impl)
        else:
            k = jnp.concatenate([ck.astype(kn.dtype), kn], axis=2)
            v = jnp.concatenate([cv.astype(vn.dtype), vn], axis=2)
            out = local_fn(q, k, v, q_meta, k_meta, bias)
        if sp > 1:
            out = a2a(out, split_axis=1, concat_axis=2)
        return out

    # head dims carry 'tensor' too (Megatron TP x Ulysses; None when the
    # mesh has no tensor axis). The CACHE heads are tensor-major,
    # seq-minor — the order the a2a's local-head split produces.
    tpax = maybe_axis(TENSOR_AXIS, mesh)
    cache_heads = ((tpax, SEQ_AXIS) if tpax and sp > 1
                   else (tpax if tpax else SEQ_AXIS))
    q_spec = P(DATA_AXIS, SEQ_AXIS, tpax, None)
    new_spec = P(DATA_AXIS, tpax, SEQ_AXIS, None)
    cache_spec = P(DATA_AXIS, cache_heads, None, None)
    meta_spec = lambda tree: jax.tree.map(lambda _: P(DATA_AXIS, None), tree)
    bias_spec = jax.tree.map(
        lambda x: P(DATA_AXIS, *([None] * (x.ndim - 1))), bias)
    out = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(q_spec, new_spec, new_spec, cache_spec, cache_spec,
                  meta_spec(q_meta), meta_spec(k_meta), bias_spec),
        out_specs=q_spec,
        check_vma=False,
    )(q, k_new, v_new, cache_k, cache_v, q_meta, k_meta, bias)
    if pad:
        # an odd-length crop cannot stay evenly seq-sharded: replicate L
        # first (downstream layers re-constrain activations themselves)
        out = jax.lax.with_sharding_constraint(
            out, P(DATA_AXIS, None, None, None))
        out = out[:, :lq_out]
    return out


def ulysses_attend(q, k, v, q_meta, k_meta, impl: str = "auto",
                   bias=None, local_fn: Optional[Callable] = None):
    """Sequence-parallel attention over the ambient mesh.

    ``local_fn(q, k, v, q_meta, k_meta, bias)`` is the per-device attention
    (defaults to :func:`ops.attention.attend` with ``impl``); it runs on
    head-sharded, full-sequence operands. Falls back to the plain local call
    when no mesh (or seq=1) is active, so one model covers both worlds.
    """
    if local_fn is None:
        from ..ops.attention import attend

        def local_fn(q, k, v, qm, km, b):
            return attend(q, k, v, qm, km, impl=impl, bias=b)

    sp = active_seq_degree()
    mesh = jax.sharding.get_abstract_mesh()
    tp = _tp_degree(mesh)
    if sp == 1 and tp == 1:
        return local_fn(q, k, v, q_meta, k_meta, bias)

    import jax.numpy as jnp
    b, lq, h, _ = q.shape
    lk, hkv = k.shape[1], k.shape[2]
    dp = int(mesh.shape.get(DATA_AXIS, 1))
    if h % (sp * tp) or hkv % (sp * tp):
        raise ValueError(f"heads ({h}/{hkv}) not divisible by "
                         f"seq*tensor = {sp}*{tp}")
    if b % dp:
        raise ValueError(f"batch {b} not divisible by data axis {dp}")
    pad = -lq % sp
    if (lq % sp or lk % sp) and (
            lq != lk or (bias is not None and not hasattr(bias, "rank"))):
        # training batches are padded upstream (collate(sp_multiple=seq));
        # only self-attention with metadata/DecodeMask masks self-pads here
        raise ValueError(
            f"Ulysses SP={sp} needs sequence lengths divisible by the seq "
            f"axis (got Lq={lq}, Lk={lk}); pad the layout "
            "(collate(..., sp_multiple=seq))")
    if pad:
        # inference self-attention at its natural length (e.g. the uncond
        # CFG row): pad rows here, crop after (see ulysses_attend_cached)
        zero4 = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = (jnp.pad(x, zero4) for x in (q, k, v))
        q_meta = _pad_meta(q_meta, pad)
        k_meta = _pad_meta(k_meta, pad)
        if bias is not None:
            bias = _pad_decode_mask(bias, pad)
    lq_out = lq

    a2a = functools.partial(jax.lax.all_to_all, axis_name=SEQ_AXIS,
                            tiled=True)

    def inner(q, k, v, q_meta, k_meta, bias):
        # seq-sharded [b, l/sp, h/tp, d] -> head-sharded [b, l, h/(sp*tp), d]
        if sp > 1:
            q = a2a(q, split_axis=2, concat_axis=1)
            k = a2a(k, split_axis=2, concat_axis=1)
            v = a2a(v, split_axis=2, concat_axis=1)
        out = local_fn(q, k, v, q_meta, k_meta, bias)
        if sp > 1:
            out = a2a(out, split_axis=1, concat_axis=2)
        return out

    tpax = maybe_axis(TENSOR_AXIS, mesh)
    qkv_spec = P(DATA_AXIS, SEQ_AXIS, tpax, None)
    meta_spec = lambda tree: jax.tree.map(lambda _: P(DATA_AXIS, None), tree)
    bias_spec = jax.tree.map(
        lambda x: P(DATA_AXIS, *([None] * (x.ndim - 1))), bias)
    out = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec,
                  meta_spec(q_meta), meta_spec(k_meta), bias_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )(q, k, v, q_meta, k_meta, bias)
    if pad:
        # see ulysses_attend_cached: replicate L before the odd-length crop
        out = jax.lax.with_sharding_constraint(
            out, P(DATA_AXIS, None, None, None))
        out = out[:, :lq_out]
    return out
