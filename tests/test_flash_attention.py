"""Pallas flash attention vs the jnp reference path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.layout import (frame_block_inference_layout, RowSpec,
                                  build_layout, tokens_per_frame)
from video_gpt_tpu.ops.attention import AttnMeta, attention_bias, mha_reference
from video_gpt_tpu.ops.flash_attention import flash_mha

pytestmark = pytest.mark.slow


def _rand_qkv(rng, b, lq, lk, h, hkv, d):
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, lq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, hkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, hkv, d), jnp.float32)
    return q, k, v


def test_bias_mode_matches_reference():
    """Precomputed-bias fast path == dense reference (incl. auto block_q)."""
    from video_gpt_tpu.ops.flash_attention import precompute_bias
    n = tokens_per_frame(32, 48)
    layout = frame_block_inference_layout(3, 2, n, use_cfg=True)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l = layout.batch, layout.length
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), b, tail, l, 4, 4, 96)
    ref = mha_reference(q, k, v, attention_bias(q_meta, meta))
    bias = precompute_bias(q_meta, meta)
    out = flash_mha(q, k, v, q_meta, meta, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("scheme", ["inference", "training"])
def test_flash_matches_reference_full(scheme):
    n = tokens_per_frame(32, 48)
    if scheme == "inference":
        layout = frame_block_inference_layout(3, 2, n, use_cfg=True)
    else:
        layout = build_layout([RowSpec((2, 2), "training"),
                               RowSpec((1, 1, 2), "training")], n)
    meta = AttnMeta.from_layout(layout)
    b, l = layout.batch, layout.length
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, l, l, 4, 4, 96)
    ref = mha_reference(q, k, v, attention_bias(meta, meta))
    out = flash_mha(q, k, v, meta, meta, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_tail_and_gqa():
    """Cached-decode shape (Lq = noisy tail, Lk = full) + grouped KV heads."""
    n = tokens_per_frame(32, 32)
    layout = frame_block_inference_layout(4, 2, n, use_cfg=True)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l = layout.batch, layout.length
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), b, tail, l, 8, 2, 64)
    ref = mha_reference(q, k, v, attention_bias(q_meta, meta))
    out = flash_mha(q, k, v, q_meta, meta, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_chunked_matches_reference_and_grads():
    """Training path: head-chunked attention == dense, with working grads."""
    from video_gpt_tpu.ops.attention import mha_chunked
    n = tokens_per_frame(32, 32)
    layout = build_layout([RowSpec((1, 2, 1), "training")], n)
    meta = AttnMeta.from_layout(layout)
    b, l = layout.batch, layout.length
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b, l, l, 8, 2, 32)
    bias = attention_bias(meta, meta)
    ref = mha_reference(q, k, v, bias)
    out = mha_chunked(q, k, v, bias, head_chunk=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_ref(q):
        return (mha_reference(q, k, v, bias) ** 2).sum()

    def loss_chk(q):
        return (mha_chunked(q, k, v, bias, head_chunk=4) ** 2).sum()

    g_ref = jax.grad(loss_ref)(q)
    g_chk = jax.grad(loss_chk)(q)
    np.testing.assert_allclose(np.asarray(g_chk), np.asarray(g_ref),
                               atol=2e-4, rtol=2e-4)


def test_flash_vjp_matches_dense_grads():
    """custom-VJP flash backward == dense-path grads (interpret mode)."""
    from video_gpt_tpu.ops import flash_attention as fa
    fa.INTERPRET = True
    try:
        n = tokens_per_frame(32, 32)
        layout = build_layout([RowSpec((1, 2, 1), "training")], n)
        meta = AttnMeta.from_layout(layout)
        b, l = layout.batch, layout.length
        q, k, v = _rand_qkv(jax.random.PRNGKey(4), b, l, l, 4, 2, 96)
        bias = fa.precompute_bias(meta, meta)
        dense_bias = attention_bias(meta, meta)

        out = fa.flash_mha_biased(q, k, v, bias)
        ref = mha_reference(q, k, v, dense_bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

        w = jax.random.normal(jax.random.PRNGKey(5), out.shape)

        def loss_flash(q, k, v):
            return (fa.flash_mha_biased(q, k, v, bias) * w).sum()

        def loss_dense(q, k, v):
            return (mha_reference(q, k, v, dense_bias) * w).sum()

        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_dn = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, bb, name in zip(g_fl, g_dn, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), atol=5e-5, rtol=5e-5,
                err_msg=f"d{name} mismatch")
    finally:
        fa.INTERPRET = False


def test_inline_vjp_matches_dense_grads():
    """Inline-mode custom VJP (forward Pallas, backward via derived bias)."""
    from video_gpt_tpu.ops import flash_attention as fa
    fa.INTERPRET = True
    try:
        n = tokens_per_frame(32, 32)
        layout = build_layout([RowSpec((2, 1), "training")], n)
        meta = AttnMeta.from_layout(layout)
        b, l = layout.batch, layout.length
        q, k, v = _rand_qkv(jax.random.PRNGKey(6), b, l, l, 4, 4, 96)
        dense_bias = attention_bias(meta, meta)
        w = jax.random.normal(jax.random.PRNGKey(7), q.shape)

        def loss_inline(q, k, v):
            return (fa.flash_mha_inline(q, k, v, meta, meta) * w).sum()

        def loss_dense(q, k, v):
            return (mha_reference(q, k, v, dense_bias) * w).sum()

        g_in = jax.grad(loss_inline, argnums=(0, 1, 2))(q, k, v)
        g_dn = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, bb in zip(g_in, g_dn):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=5e-5, rtol=5e-5)
    finally:
        fa.INTERPRET = False


def test_streaming_matches_reference_and_grads():
    """k-streaming kernel (length-unbounded) fwd == dense; grads via the
    chunked-backward custom VJP."""
    from video_gpt_tpu.ops import flash_attention as fa
    fa.INTERPRET = True
    try:
        n = tokens_per_frame(32, 48)
        layout = frame_block_inference_layout(3, 2, n, use_cfg=True)
        meta = AttnMeta.from_layout(layout)
        tail = layout.noisy_tail_len()
        q_meta = meta.tail(tail)
        b, l = layout.batch, layout.length
        q, k, v = _rand_qkv(jax.random.PRNGKey(8), b, tail, l, 4, 2, 96)
        bias = fa.precompute_bias(q_meta, meta)
        dense = attention_bias(q_meta, meta)
        ref = mha_reference(q, k, v, dense)
        out = fa.flash_mha_streaming(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        g1 = jax.grad(lambda q: (fa.flash_mha_streaming(q, k, v, bias) ** 2
                                 ).sum())(q)
        g2 = jax.grad(lambda q: (mha_reference(q, k, v, dense) ** 2).sum())(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-5, rtol=5e-5)
    finally:
        fa.INTERPRET = False


def test_streaming_inline_matches_reference():
    """Metadata-inline streaming (no bias tensor) == dense reference on both
    inference and training layouts."""
    from video_gpt_tpu.ops import flash_attention as fa
    fa.INTERPRET = True
    try:
        n = tokens_per_frame(32, 48)
        layout = frame_block_inference_layout(3, 2, n, use_cfg=True)
        meta = AttnMeta.from_layout(layout)
        tail = layout.noisy_tail_len()
        q_meta = meta.tail(tail)
        b, l = layout.batch, layout.length
        q, k, v = _rand_qkv(jax.random.PRNGKey(9), b, tail, l, 4, 2, 96)
        ref = mha_reference(q, k, v, attention_bias(q_meta, meta))
        out, _lse = fa._stream_inline_fwd(q, k, v, q_meta, meta,
                                          block_q=16, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

        lay2 = build_layout([RowSpec((1, 2, 1), "training")], n)
        m2 = AttnMeta.from_layout(lay2)
        q2, k2, v2 = _rand_qkv(jax.random.PRNGKey(10), 1, lay2.length,
                               lay2.length, 4, 4, 64)
        ref2 = mha_reference(q2, k2, v2, attention_bias(m2, m2))
        out2, _ = fa._stream_inline_fwd(q2, k2, v2, m2, m2,
                                        block_q=16, block_k=128)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                                   atol=2e-5, rtol=2e-5)
    finally:
        fa.INTERPRET = False


@pytest.mark.parametrize("h,hkv", [(2, 2), (4, 2)])
def test_streaming_backward_kernels_match_dense_grads(h, hkv):
    """Streaming Pallas backward (dq + dk/dv kernels, metadata-inline mask,
    multi-tile accumulation) == dense-attention gradients. (4, 2) pins the
    GQA path: dK/dV's innermost grid dim walks the q-head group,
    accumulating the cross-head sum into per-kv-head blocks."""
    import video_gpt_tpu.ops.flash_attention as fa

    n = tokens_per_frame(32, 48)
    layout = build_layout([RowSpec((2, 2), "training"),
                           RowSpec((1, 1, 2), "training")], n)
    meta = AttnMeta.from_layout(layout)
    b, l = layout.batch, layout.length
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), b, l, l, h, hkv, 32)
    do = jax.random.normal(jax.random.PRNGKey(6), q.shape, jnp.float32)

    dense_bias = attention_bias(meta, meta)
    want_o, pullback = jax.vjp(
        lambda q, k, v: mha_reference(q, k, v, dense_bias), q, k, v)
    want_dq, want_dk, want_dv = pullback(do)

    fa.INTERPRET = True
    try:
        # small blocks force multi-tile accumulation in all three kernels
        o, lse = fa._stream_inline_fwd(q, k, v, meta, meta,
                                       block_q=16, block_k=128)
        np.testing.assert_allclose(np.asarray(o), np.asarray(want_o),
                                   atol=2e-5, rtol=2e-5)
        dq, dk, dv = fa._stream_inline_bwd_impl(
            q, k, v, o, lse, do, meta, meta, block_q=16, block_k=128)
    finally:
        fa.INTERPRET = False
    np.testing.assert_allclose(np.asarray(dq), np.asarray(want_dq),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(want_dk),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want_dv),
                               atol=1e-4, rtol=1e-4)


def test_streaming_inline_public_vjp_matches_dense():
    """jax.grad through flash_mha_streaming_inline (the stage-2/3/4 training
    path) == dense gradients, via the custom VJP."""
    import video_gpt_tpu.ops.flash_attention as fa

    n = tokens_per_frame(32, 32)
    layout = build_layout([RowSpec((1, 2), "training")], n)
    meta = AttnMeta.from_layout(layout)
    b, l = layout.batch, layout.length
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), b, l, l, 2, 2, 32)
    w = jax.random.normal(jax.random.PRNGKey(8), q.shape, jnp.float32)

    dense_bias = attention_bias(meta, meta)

    def loss_dense(q, k, v):
        return jnp.sum(mha_reference(q, k, v, dense_bias) * w)

    def loss_stream(q, k, v):
        return jnp.sum(fa.flash_mha_streaming_inline(q, k, v, meta, meta)
                       * w)

    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    fa.INTERPRET = True
    try:
        got = jax.grad(loss_stream, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.INTERPRET = False
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   atol=1e-4, rtol=1e-4)


def test_decode_rank_collapse_bit_exact():
    """layout.decode_rank's columnar mask == the dense rule on tail rows."""
    from video_gpt_tpu.layout import decode_rank, render_dense_mask
    n = tokens_per_frame(32, 48)
    for n_clean, n_gen in ((3, 2), (0, 2), (5, 1)):
        layout = frame_block_inference_layout(n_clean, n_gen, n, use_cfg=False)
        tail = layout.noisy_tail_len()
        got = decode_rank(layout, tail)
        assert got is not None, (n_clean, n_gen)
        rank, q_off = got
        dense = render_dense_mask(layout)[:, -tail:, :]
        columnar = q_off[:, :, None] >= rank[:, None, :]
        np.testing.assert_array_equal(columnar, dense)


def test_flash_decode_streaming_matches_reference():
    """k-streaming columnar decode (long-rollout windows) == dense, with
    k-tiling actually engaged (block_k < Lk) and GQA."""
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops.flash_attention import flash_mha_decode_streaming
    n = tokens_per_frame(32, 48)
    for n_clean, h, hkv in ((3, 4, 4), (2, 4, 2)):
        layout = frame_block_inference_layout(n_clean, 2, n, use_cfg=False)
        meta = AttnMeta.from_layout(layout)
        tail = layout.noisy_tail_len()
        q_meta = meta.tail(tail)
        b, l = layout.batch, layout.length
        q, k, v = _rand_qkv(jax.random.PRNGKey(9), b, tail, l, h, hkv, 96)
        ref = mha_reference(q, k, v, attention_bias(q_meta, meta))
        out = flash_mha_decode_streaming(q, k, v, decode_mask(q_meta, meta),
                                         block_q=96, block_k=128,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_kv_heads_major_matches_tokens_major():
    """The production cached-inference K/V layout ([B,Hkv,L,128] heads-major
    lane-padded, phi3.KVCache) through each kernel == tokens-major."""
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops import flash_attention as fa
    n = tokens_per_frame(32, 48)
    layout = frame_block_inference_layout(3, 2, n, use_cfg=False)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l, h, d = layout.batch, layout.length, 4, 96
    q, k, v = _rand_qkv(jax.random.PRNGKey(11), b, tail, l, h, h, d)
    dp = d + (-d % 128)
    pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
    k_hm = jnp.pad(k.transpose(0, 2, 1, 3), pad)
    v_hm = jnp.pad(v.transpose(0, 2, 1, 3), pad)
    dm = decode_mask(q_meta, meta)

    cases = [
        (lambda k_, v_, hm: fa.flash_mha_decode(
            q, k_, v_, dm, interpret=True, kv_heads_major=hm)),
        (lambda k_, v_, hm: fa.flash_mha(
            q, k_, v_, q_meta, meta, interpret=True, kv_heads_major=hm)),
        (lambda k_, v_, hm: fa.flash_mha_decode_streaming(
            q, k_, v_, dm, block_k=128, interpret=True, kv_heads_major=hm)),
    ]
    for fn in cases:
        want = fn(k, v, False)
        got = fn(k_hm, v_hm, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_flash_decode_split_matches_concat():
    """Split cache/tail decode kernels (resident + k-streaming) == the
    single-operand kernel over concat([cache, tail]) == dense reference,
    incl. GQA and cache lengths that are not tile multiples."""
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops import flash_attention as fa
    n = tokens_per_frame(32, 48)
    for n_clean, h, hkv in ((3, 4, 4), (2, 4, 2), (5, 4, 4)):
        layout = frame_block_inference_layout(n_clean, 2, n, use_cfg=False)
        meta = AttnMeta.from_layout(layout)
        tail = layout.noisy_tail_len()
        q_meta = meta.tail(tail)
        b, l, d = layout.batch, layout.length, 96
        lc = l - tail
        q, k, v = _rand_qkv(jax.random.PRNGKey(13), b, tail, l, h, hkv, d)
        ref = mha_reference(q, k, v, attention_bias(q_meta, meta))
        dm = decode_mask(q_meta, meta)
        dp = d + (-d % 128)
        pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
        k_hm = jnp.pad(k.transpose(0, 2, 1, 3), pad)
        v_hm = jnp.pad(v.transpose(0, 2, 1, 3), pad)
        kc, kt = k_hm[:, :, :lc], k_hm[:, :, lc:]
        vc, vt = v_hm[:, :, :lc], v_hm[:, :, lc:]
        out_res = fa.flash_mha_decode_split(q, kc, vc, kt, vt, dm,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(out_res), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        # streaming with the k-grid genuinely spanning both operands
        out_str = fa.flash_mha_decode_streaming_split(
            q, kc, vc, kt, vt, dm, block_q=96, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out_str), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_decode_pipelined_body_matches_serial():
    """VGT_DECODE_NSUB>1 (software-pipelined MXU/VPU decode body) matches
    the serial body and the dense reference, resident + split kernels,
    including an Lk where nsub must self-reduce to keep 128-alignment."""
    import os

    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops import flash_attention as fa
    n = tokens_per_frame(32, 48)
    layout = frame_block_inference_layout(3, 2, n, use_cfg=False)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l, h, d = layout.batch, layout.length, 4, 96
    lc = l - tail
    q, k, v = _rand_qkv(jax.random.PRNGKey(17), b, tail, l, h, h, d)
    ref = mha_reference(q, k, v, attention_bias(q_meta, meta))
    dm = decode_mask(q_meta, meta)
    dp = d + (-d % 128)
    pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
    k_hm = jnp.pad(k.transpose(0, 2, 1, 3), pad)
    v_hm = jnp.pad(v.transpose(0, 2, 1, 3), pad)
    kc, kt = k_hm[:, :, :lc], k_hm[:, :, lc:]
    vc, vt = v_hm[:, :, :lc], v_hm[:, :, lc:]
    for nsub in ("2", "4", "7"):  # 7 never divides -> self-reduces
        os.environ["VGT_DECODE_NSUB"] = nsub
        os.environ["VGT_STREAM_NSUB"] = nsub
        try:
            out = fa.flash_mha_decode(q, k, v, dm, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
            out = fa.flash_mha_decode_split(q, kc, vc, kt, vt, dm,
                                            interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
            out = fa.flash_mha_decode_streaming_split(
                q, kc, vc, kt, vt, dm, block_q=96, block_k=256,
                interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)
        finally:
            del os.environ["VGT_DECODE_NSUB"]
            del os.environ["VGT_STREAM_NSUB"]


def test_attend_decode_split_dispatch_fallback():
    """attend_decode_split off-TPU (no interpret): concat fallback stays
    bit-consistent with attend over the concatenated operands."""
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops.attention import attend, attend_decode_split
    n = tokens_per_frame(32, 48)
    layout = frame_block_inference_layout(2, 2, n, use_cfg=False)
    meta = AttnMeta.from_layout(layout)
    tail = layout.noisy_tail_len()
    q_meta = meta.tail(tail)
    b, l, h, d = layout.batch, layout.length, 4, 96
    lc = l - tail
    q, k, v = _rand_qkv(jax.random.PRNGKey(17), b, tail, l, h, h, d)
    dm = decode_mask(q_meta, meta)
    dp = d + (-d % 128)
    pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
    k_hm = jnp.pad(k.transpose(0, 2, 1, 3), pad)
    v_hm = jnp.pad(v.transpose(0, 2, 1, 3), pad)
    got = attend_decode_split(q, k_hm[:, :, :lc], v_hm[:, :, :lc],
                              k_hm[:, :, lc:], v_hm[:, :, lc:],
                              q_meta, meta, dm)
    want = attend(q, k_hm, v_hm, q_meta, meta, bias=dm, kv_heads_major=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


def test_decode_rank_rejects_lossy_layouts():
    from video_gpt_tpu.layout import decode_rank
    n = tokens_per_frame(32, 48)
    # training scheme, full-length tail: queries include clean-copy tokens
    # (q_block == -1) and noisy tokens of several blocks
    layout = build_layout([RowSpec((2, 2), "training")], n)
    assert decode_rank(layout, layout.length) is None
    # tail spanning two noisy blocks (block0 noisy + block0 clean + block1
    # noisy): clean queries in the middle reject the collapse
    tail_two_blocks = layout.length  # == all of row 0's tokens here
    assert decode_rank(layout, tail_two_blocks) is None
    # inference layout, tail reaching into the clean prefix
    inf = frame_block_inference_layout(2, 2, n, use_cfg=False)
    too_long = inf.noisy_tail_len() + (n + 2)  # includes clean queries
    assert decode_rank(inf, too_long) is None


def test_flash_decode_kernel_matches_reference():
    """flash_mha_decode == dense reference at decode shapes (incl. GQA)."""
    from video_gpt_tpu.layout import decode_rank
    from video_gpt_tpu.models.video_gpt import decode_mask
    from video_gpt_tpu.ops.flash_attention import DecodeMask, flash_mha_decode
    n = tokens_per_frame(32, 48)
    for n_clean, h, hkv in ((3, 4, 4), (2, 4, 2), (0, 4, 4)):
        layout = frame_block_inference_layout(n_clean, 2, n, use_cfg=False)
        meta = AttnMeta.from_layout(layout)
        tail = layout.noisy_tail_len()
        q_meta = meta.tail(tail)
        b, l = layout.batch, layout.length
        q, k, v = _rand_qkv(jax.random.PRNGKey(7), b, tail, l, h, hkv, 96)
        ref = mha_reference(q, k, v, attention_bias(q_meta, meta))
        # device-side mask derivation must equal the host-side one
        rank_np, qoff_np = decode_rank(layout, tail)
        dm = decode_mask(q_meta, meta)
        np.testing.assert_array_equal(np.asarray(dm.rank), rank_np)
        np.testing.assert_array_equal(np.asarray(dm.q_off), qoff_np)
        out = flash_mha_decode(q, k, v, dm, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
