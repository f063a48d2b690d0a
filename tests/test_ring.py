"""Ring attention (blockwise K/V rotation) vs the single-device oracle.

Same discipline as tests/test_ulysses.py: the CPU device mesh makes
"sharded == unsharded" a deterministic unit test, for the forward merge,
the travelling-accumulator backward, and a full Trainer step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_gpt_tpu.ops.attention import AttnMeta, attend
from video_gpt_tpu.layout import RowSpec, build_layout
from video_gpt_tpu.parallel.ring import ring_attend

pytestmark = pytest.mark.slow


def _mesh(data=2, seq=4):
    if len(jax.devices()) < data * seq:
        pytest.skip("needs 8 CPU devices")
    from video_gpt_tpu.config import MeshConfig
    from video_gpt_tpu.parallel.mesh import make_mesh
    return make_mesh(MeshConfig(data=data, seq=seq))


def _layout_and_qkv(seed=0, b=2, h=4, hkv=4, d=8, sp=4):
    layout = build_layout([RowSpec((1, 1), "training")] * b, n_img=4,
                          pad_to_multiple=sp)
    meta = AttnMeta.from_layout(layout)
    l = layout.length
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, l, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, hkv, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, hkv, d), jnp.float32)
    return layout, meta, q, k, v


def test_ring_attend_matches_dense():
    mesh = _mesh()
    _, meta, q, k, v = _layout_and_qkv()
    want = attend(q, k, v, meta, meta, impl="reference")
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda q, k, v: ring_attend(
            q, k, v, meta, meta, impl="reference"))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ring_attend_gqa_matches_dense():
    mesh = _mesh()
    _, meta, q, k, v = _layout_and_qkv(seed=2, h=4, hkv=2)
    want = attend(q, k, v, meta, meta, impl="reference")
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda q, k, v: ring_attend(
            q, k, v, meta, meta, impl="reference"))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ring_attend_gradients_match():
    """dK/dV accumulators travel a full ring cycle back to their owner."""
    mesh = _mesh()
    _, meta, q, k, v = _layout_and_qkv(seed=1)

    def loss_dense(q, k, v):
        return jnp.sum(attend(q, k, v, meta, meta, impl="reference") ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attend(q, k, v, meta, meta,
                                   impl="reference") ** 2)

    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4, rtol=1e-4)


def test_trainer_step_with_ring(tmp_path):
    """Real Trainer steps over a (2, 4) mesh with sp_attention='ring'."""
    from video_gpt_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from video_gpt_tpu.models.vae import VAEConfig
    from video_gpt_tpu.training.trainer import Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 CPU devices")
    cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                      mixed_precision="no", lr=1e-3,
                      lr_scheduler="constant", log_every=1, ckpt_every=1000,
                      results_dir=str(tmp_path), sp_attention="ring")
    t = Trainer(ModelConfig.tiny(attn_impl="reference",
                                 pos_embed_max_size=192),
                cfg, "/root/reference/vids", vae_cfg=VAEConfig.tiny(),
                target_resolution=(48, 64),
                mesh_cfg=MeshConfig(data=2, seq=4))
    assert t.model_cfg.sp_attention == "ring"
    state = t.run(2)
    assert int(state.step) == 2
    assert np.isfinite(float(jax.tree.leaves(state.params)[0].sum()))


def test_ring_pallas_chunks_support_gqa():
    """GQA (hkv < h) rides the STREAMING Pallas chunk kernels (their K/V
    block specs are natively grouped) instead of silently dropping to the
    dense fp32 per-chunk math — fwd and travelling-accumulator bwd vs the
    single-device oracle (VERDICT r3 ask #7)."""
    import video_gpt_tpu.ops.flash_attention as fa

    mesh = _mesh()
    _, meta, q, k, v = _layout_and_qkv(seed=3, h=4, hkv=2)

    def loss_dense(q, k, v):
        return jnp.sum(attend(q, k, v, meta, meta, impl="reference") ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attend(q, k, v, meta, meta, impl="pallas") ** 2)

    want_out = attend(q, k, v, meta, meta, impl="reference")
    want_g = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    fa.INTERPRET = True
    try:
        with jax.sharding.set_mesh(mesh):
            got_out = jax.jit(lambda q, k, v: ring_attend(
                q, k, v, meta, meta, impl="pallas"))(q, k, v)
            got_g = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    finally:
        fa.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=1e-4, rtol=1e-4)
    for g, w in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-3, rtol=1e-3)
