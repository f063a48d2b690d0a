"""Pallas kernels compiled on the real chip vs jnp oracles (bf16 tolerance).

CPU interpret-mode tests (tests/test_flash_attention.py) check the math;
these check what interpret mode cannot: mosaic lowering, VMEM fit at
production block sizes, and bf16 accumulation error staying in budget.
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp

from video_gpt_tpu.layout import RowSpec, build_layout, tokens_per_frame
from video_gpt_tpu.ops import flash_attention as fa
from video_gpt_tpu.ops.attention import (AttnMeta, attention_bias,
                                         mha_chunked, mha_reference)

N = tokens_per_frame(176, 320)  # 220 — the reference inference geometry


def _qkv(layout, h=8, d=96, seed=0, dtype=jnp.bfloat16):
    meta = AttnMeta.from_layout(layout)
    l = layout.length
    rng = jax.random.PRNGKey(seed)
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (layout.batch, l, h, d), dtype)
    k = jax.random.normal(ks[1], (layout.batch, l, h, d), dtype)
    v = jax.random.normal(ks[2], (layout.batch, l, h, d), dtype)
    do = jax.random.normal(ks[3], q.shape, dtype)
    return meta, q, k, v, do


def test_resident_bias_mode_fwd_bwd_on_chip():
    layout = build_layout([RowSpec((2, 2, 2), "training")], N)  # ~2.7k
    meta, q, k, v, do = _qkv(layout)
    bias = fa.precompute_bias(meta, meta)

    def f_flash(q, k, v):
        return jnp.sum((fa.flash_mha_biased(q, k, v, bias) * do)
                       .astype(jnp.float32))

    dense_bias = attention_bias(meta, meta)

    def f_dense(q, k, v):
        return jnp.sum((mha_reference(q, k, v, dense_bias) * do)
                       .astype(jnp.float32))

    got = jax.jit(jax.grad(f_flash, argnums=(0, 1, 2)))(q, k, v)
    want = jax.jit(jax.grad(f_dense, argnums=(0, 1, 2)))(q, k, v)
    for g, w in zip(got, want):
        err = np.abs(np.asarray(g, np.float32) - np.asarray(w, np.float32))
        scale = np.abs(np.asarray(w, np.float32)).max() + 1e-6
        # both sides are bf16 pipelines; on v5e their accumulation orders
        # differ by a few ulps more than interpret mode (~2.8% of max obs.)
        assert err.max() / scale < 4e-2, err.max()


def test_streaming_inline_fwd_bwd_on_chip_beyond_resident_cap():
    # 9324 keys: past the resident kernels' ~8k VMEM cap
    layout = build_layout([RowSpec((6, 6, 6, 6), "training")], N)
    meta, q, k, v, do = _qkv(layout, h=4)
    assert not fa.flash_attention_supported(q, k, v)

    def f_stream(q, k, v):
        return jnp.sum((fa.flash_mha_streaming_inline(q, k, v, meta, meta)
                        * do).astype(jnp.float32))

    # the dense bias rides as an ARGUMENT: closed over it becomes a ~350MB
    # jit constant, which the axon remote-compile endpoint rejects (HTTP 413)
    dense_bias = attention_bias(meta, meta, jnp.float32)

    def f_chunk(q, k, v, bias):
        return jnp.sum((mha_chunked(q, k, v, bias) * do)
                       .astype(jnp.float32))

    got = jax.jit(jax.grad(f_stream, argnums=(0, 1, 2)))(q, k, v)
    want = jax.jit(jax.grad(f_chunk, argnums=(0, 1, 2)))(q, k, v, dense_bias)
    for g, w in zip(got, want):
        err = np.abs(np.asarray(g, np.float32) - np.asarray(w, np.float32))
        scale = np.abs(np.asarray(w, np.float32)).max() + 1e-6
        assert err.max() / scale < 4e-2, err.max()


def test_decode_rank_kernel_on_chip_long_tail():
    """flash_mha_decode at long-rollout shapes: Lk past the 5504 VMEM
    threshold selects block_q=96 with a TILED q sweep — the sublane-dim
    q_off block spec must lower on real mosaic (a lane-dim spec needs
    128-divisibility and rejects 96)."""
    from video_gpt_tpu.layout import frame_block_inference_layout
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops.flash_attention import flash_mha_decode

    layout = frame_block_inference_layout(8, 24, N, use_cfg=False)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l = layout.batch, layout.length
    rng = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(rng[0], (b, tail, 4, 96), jnp.bfloat16)
    k = jax.random.normal(rng[1], (b, l, 4, 96), jnp.bfloat16)
    v = jax.random.normal(rng[2], (b, l, 4, 96), jnp.bfloat16)
    out = jax.jit(flash_mha_decode)(q, k, v, decode_mask(q_meta, meta))
    ref = mha_reference(q, k, v, attention_bias(q_meta, meta))
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 3e-2, err.max()


def test_kv_heads_major_cache_layout_on_chip():
    """The heads-major lane-padded cache layout through the resident decode
    kernel on real mosaic == tokens-major (the CPU suite runs the cached
    pipeline through the dense path, so this is the only automated check of
    the layout the production decode step actually feeds the kernel)."""
    from video_gpt_tpu.layout import frame_block_inference_layout
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops.flash_attention import flash_mha_decode

    layout = frame_block_inference_layout(8, 16, N, use_cfg=False)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l, h, d = layout.batch, layout.length, 4, 96
    rng = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(rng[0], (b, tail, h, d), jnp.bfloat16)
    k = jax.random.normal(rng[1], (b, l, h, d), jnp.bfloat16)
    v = jax.random.normal(rng[2], (b, l, h, d), jnp.bfloat16)
    dp = d + (-d % 128)
    pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
    k_hm = jnp.pad(k.transpose(0, 2, 1, 3), pad)
    v_hm = jnp.pad(v.transpose(0, 2, 1, 3), pad)
    dm = decode_mask(q_meta, meta)
    want = jax.jit(flash_mha_decode)(q, k, v, dm)
    got = jax.jit(functools.partial(flash_mha_decode, kv_heads_major=True))(
        q, k_hm, v_hm, dm)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.max() < 1e-2, err.max()


def test_streaming_decode_on_chip_rollout_window():
    """k-streaming columnar decode at long-rollout shapes (Lk ~ 17k, past
    the resident cap) vs the 7-vector inline streaming path."""
    from video_gpt_tpu.layout import frame_block_inference_layout
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops.flash_attention import (
        _stream_inline_fwd, flash_mha_decode_streaming)

    layout = frame_block_inference_layout(56, 24, N, use_cfg=False)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l = layout.batch, layout.length
    rng = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(rng[0], (b, tail, 4, 96), jnp.bfloat16)
    k = jax.random.normal(rng[1], (b, l, 4, 96), jnp.bfloat16)
    v = jax.random.normal(rng[2], (b, l, 4, 96), jnp.bfloat16)
    out = jax.jit(flash_mha_decode_streaming)(q, k, v,
                                              decode_mask(q_meta, meta))
    want, _ = jax.jit(_stream_inline_fwd)(q, k, v, q_meta, meta)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(want, np.float32))
    assert err.max() < 3e-2, err.max()


def test_streaming_inline_stage4_length_smoke():
    """Stage-4 sequence (80 frames ~= 35.5k tokens): fwd+bwd compiles, runs,
    grads finite — the length the round-1 dense-bias path could never reach
    (pretrain_stage4_nv.sh:41-42)."""
    layout = build_layout([RowSpec((8,) * 10, "training")], N)
    meta, q, k, v, do = _qkv(layout, h=4)

    def loss(q, k, v):
        return jnp.sum((fa.flash_mha_streaming_inline(q, k, v, meta, meta)
                        * do).astype(jnp.float32))

    dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    assert bool(jnp.isfinite(dq.astype(jnp.float32)).all())
    assert bool(jnp.isfinite(dk.astype(jnp.float32)).all())
    assert bool(jnp.isfinite(dv.astype(jnp.float32)).all())


def test_split_decode_kernels_on_chip():
    """Split cache/tail decode (the zero-concat denoise step) vs the
    single-operand kernels at production shapes: resident at the flagship
    8+16 geometry, k-streaming at the 56+24 rollout window."""
    from video_gpt_tpu.layout import frame_block_inference_layout
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops import flash_attention as fa

    for n_clean, n_gen, streaming in ((8, 16, False), (56, 24, True)):
        layout = frame_block_inference_layout(n_clean, n_gen, N,
                                              use_cfg=False)
        meta = AttnMeta.from_layout(layout)
        tail = layout.noisy_tail_len()
        q_meta = meta.tail(tail)
        b, l, h, d = layout.batch, layout.length, 4, 96
        lc = l - tail
        rng = jax.random.split(jax.random.PRNGKey(21), 3)
        q = jax.random.normal(rng[0], (b, tail, h, d), jnp.bfloat16)
        k = jax.random.normal(rng[1], (b, l, h, d), jnp.bfloat16)
        v = jax.random.normal(rng[2], (b, l, h, d), jnp.bfloat16)
        dp = d + (-d % 128)
        pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
        k_hm = jnp.pad(k.transpose(0, 2, 1, 3), pad)
        v_hm = jnp.pad(v.transpose(0, 2, 1, 3), pad)
        dm = decode_mask(q_meta, meta)
        if streaming:
            got = jax.jit(fa.flash_mha_decode_streaming_split)(
                q, k_hm[:, :, :lc], v_hm[:, :, :lc],
                k_hm[:, :, lc:], v_hm[:, :, lc:], dm)
            want = jax.jit(functools.partial(
                fa.flash_mha_decode_streaming, kv_heads_major=True))(
                q, k_hm, v_hm, dm)
        else:
            got = jax.jit(fa.flash_mha_decode_split)(
                q, k_hm[:, :, :lc], v_hm[:, :, :lc],
                k_hm[:, :, lc:], v_hm[:, :, lc:], dm)
            want = jax.jit(functools.partial(
                fa.flash_mha_decode, kv_heads_major=True))(q, k_hm, v_hm, dm)
        err = np.abs(np.asarray(got, np.float32)
                     - np.asarray(want, np.float32))
        assert err.max() < 3e-2, (n_clean, n_gen, err.max())


def test_pipelined_decode_body_on_chip():
    """VGT_DECODE_NSUB>1 (software-pipelined MXU/VPU body) COMPILED on real
    mosaic — interpret mode cannot prove the subtile lane-slices lower."""
    import os

    from video_gpt_tpu.layout import frame_block_inference_layout
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops import flash_attention as fa

    layout = frame_block_inference_layout(8, 16, N, use_cfg=False)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l, h, d = layout.batch, layout.length, 4, 96
    lc = l - tail
    rng = jax.random.split(jax.random.PRNGKey(23), 3)
    q = jax.random.normal(rng[0], (b, tail, h, d), jnp.bfloat16)
    k = jax.random.normal(rng[1], (b, l, h, d), jnp.bfloat16)
    v = jax.random.normal(rng[2], (b, l, h, d), jnp.bfloat16)
    dp = d + (-d % 128)
    pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
    k_hm = jnp.pad(k.transpose(0, 2, 1, 3), pad)
    v_hm = jnp.pad(v.transpose(0, 2, 1, 3), pad)
    dm = decode_mask(q_meta, meta)
    want = jax.jit(functools.partial(
        fa.flash_mha_decode, kv_heads_major=True))(q, k_hm, v_hm, dm)
    os.environ["VGT_DECODE_NSUB"] = "4"
    os.environ["VGT_STREAM_NSUB"] = "2"
    try:
        got = jax.jit(functools.partial(
            fa.flash_mha_decode, kv_heads_major=True, block_q=512))(
            q, k_hm, v_hm, dm)
        got_split = jax.jit(functools.partial(
            fa.flash_mha_decode_split, block_q=512))(
            q, k_hm[:, :, :lc], v_hm[:, :, :lc],
            k_hm[:, :, lc:], v_hm[:, :, lc:], dm)
        got_stream = jax.jit(functools.partial(
            fa.flash_mha_decode_streaming_split, block_q=512, block_k=512))(
            q, k_hm[:, :, :lc], v_hm[:, :, :lc],
            k_hm[:, :, lc:], v_hm[:, :, lc:], dm)
    finally:
        del os.environ["VGT_DECODE_NSUB"]
        del os.environ["VGT_STREAM_NSUB"]
    for got_ in (got, got_split, got_stream):
        err = np.abs(np.asarray(got_, np.float32)
                     - np.asarray(want, np.float32))
        assert err.max() < 3e-2, err.max()


def test_pallas_flash_inside_shard_map_on_chip():
    """The COMPILED (non-interpret) flash kernel lowered inside a
    ``jax.shard_map`` on real hardware — the composition every Ulysses SP
    path runs (parallel/ulysses.py inner fns); the CPU suite can only cover
    it in interpret mode (tests/test_ulysses.py)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from video_gpt_tpu.ops.attention import attend

    layout = build_layout([RowSpec((2, 2), "training")], N)
    meta, q, k, v, _ = _qkv(layout, h=4)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "seq"))

    def inner(q, k, v, q_meta, k_meta):
        # head-sharded operands, metadata-mask pallas kernel — what
        # ulysses_attend's inner runs per shard
        return attend(q, k, v, q_meta, k_meta, impl="pallas")

    meta_spec = jax.tree.map(lambda _: P("data", None), meta)
    out = jax.jit(jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P("data", "seq", None, None),) * 3 + (meta_spec,) * 2,
        out_specs=P("data", "seq", None, None),
        check_vma=False,
    ))(q, k, v, meta, meta)
    ref = mha_reference(q, k, v, attention_bias(meta, meta))
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 3e-2, err.max()


def test_decode_kernel_inside_shard_map_on_chip():
    """The cached SP-serving step per shard: the columnar DecodeMask kernel
    on heads-major operands lowered inside ``jax.shard_map``
    (ulysses_attend_cached's inner)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from video_gpt_tpu.layout import frame_block_inference_layout
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops.attention import attend

    layout = frame_block_inference_layout(8, 16, N, use_cfg=False)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l, h, d = layout.batch, layout.length, 4, 96
    rng = jax.random.split(jax.random.PRNGKey(23), 3)
    q = jax.random.normal(rng[0], (b, tail, h, d), jnp.bfloat16)
    k = jax.random.normal(rng[1], (b, l, h, d), jnp.bfloat16)
    v = jax.random.normal(rng[2], (b, l, h, d), jnp.bfloat16)
    dp = d + (-d % 128)
    pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
    k_hm = jnp.pad(k.transpose(0, 2, 1, 3), pad)
    v_hm = jnp.pad(v.transpose(0, 2, 1, 3), pad)
    dm = decode_mask(q_meta, meta)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "seq"))

    def inner(q, k, v, q_meta, k_meta, dm):
        return attend(q, k, v, q_meta, k_meta, impl="pallas", bias=dm,
                      kv_heads_major=True)

    meta_spec = jax.tree.map(lambda _: P("data", None), meta)
    dm_spec = jax.tree.map(lambda _: P("data", None), dm)
    out = jax.jit(jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P("data", None, "seq", None),
                  P("data", "seq", None, None),
                  P("data", "seq", None, None),
                  jax.tree.map(lambda _: P("data", None), q_meta),
                  meta_spec, dm_spec),
        out_specs=P("data", None, "seq", None),
        check_vma=False,
    ))(q, k_hm, v_hm, q_meta, meta, dm)
    ref = mha_reference(q, k, v, attention_bias(q_meta, meta))
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 3e-2, err.max()
