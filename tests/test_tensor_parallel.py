"""Megatron-style tensor parallelism: layout conversion, forward/grad
parity, cached decode, SP composition, and placement rules.

The reference has no TP (its parallelism is DeepSpeed ZeRO + Ulysses SP,
LVM/acceleration/*); this is a TPU-native addition: kernels sharded over the
mesh's 'tensor' axis in the block-aligned TP-grouped fused layout
(parallel/tensor.py), attention running head-parallel through the same
shard_maps as Ulysses. Parity here is exact up to float reassociation: a
TP=2 model with regrouped params must reproduce the TP=1 model bit-for-bit
in fp32 within tolerance.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import MeshConfig, ModelConfig
from video_gpt_tpu.layout import (frame_block_inference_layout,
                                  tokens_per_frame)
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.parallel.mesh import (TENSOR_AXIS, make_mesh,
                                         param_specs)
from video_gpt_tpu.parallel.tensor import (qkv_group_sizes, regroup_columns,
                                           tp_regroup_params)


def _mesh(data=1, seq=1, tensor=2, pipe=1):
    if len(jax.devices()) < data * seq * tensor * pipe:
        pytest.skip("needs fake CPU devices")
    return make_mesh(MeshConfig(data=data, seq=seq, tensor=tensor,
                                pipe=pipe))


def test_regroup_columns_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(3, 7, 24).astype(np.float32)  # e.g. [layers, in, features]
    for tp in (2, 4):
        g = regroup_columns(w, (8, 8, 8), tp)
        back = regroup_columns(g, (8, 8, 8), tp, inverse=True)
        np.testing.assert_array_equal(back, w)
        assert not np.array_equal(g, w)


def test_regroup_matches_per_head_grouping():
    """Grouped column order == shard-major [q_i|k_i|v_i] by construction."""
    h, hkv, d, tp = 4, 2, 3, 2
    sizes = (h * d, hkv * d, hkv * d)
    w = np.arange(sum(sizes))[None, :].astype(np.float32)
    g = regroup_columns(w, sizes, tp)[0]
    # shard 0: q heads 0..1, k head 0, v head 0 (their standard indices)
    q0 = np.arange(0, h * d // tp)
    k0 = np.arange(h * d, h * d + hkv * d // tp)
    v0 = np.arange((h + hkv) * d, (h + hkv) * d + hkv * d // tp)
    np.testing.assert_array_equal(
        g[: (h // tp + 2 * hkv // tp) * d], np.concatenate([q0, k0, v0]))


def _tiny(tp=1, kv_heads=4, **kw):
    return ModelConfig.tiny(attn_impl="reference", num_kv_heads=kv_heads,
                            tensor_parallel=tp, **kw)


def _setup(kv_heads=4):
    """Standard-layout params + a forward closure builder."""
    cfg1 = _tiny(kv_heads=kv_heads)
    model = VideoGPT(cfg1, dtype=jnp.float32)
    H = W = 48
    n = tokens_per_frame(H, W)
    lay = frame_block_inference_layout(2, 1, n, use_cfg=True)
    batch = Batch.from_layout(lay)
    z = jax.random.normal(jax.random.PRNGKey(4), (2, H // 8, W // 8, 4))
    cl = jax.random.normal(jax.random.PRNGKey(5), (2, H // 8, W // 8, 4))
    t = jnp.full((2,), 0.4)
    params = model.init(jax.random.PRNGKey(1), batch, z, t, cl)
    # perturb: the zero-init final layer would make every output 0
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
              for l, r in zip(leaves, rngs)]
    params = jax.tree.unflatten(treedef, leaves)
    return params, (batch, z, t, cl), H


# the GQA variant traces a second head geometry — slow tier
@pytest.mark.parametrize(
    "kv_heads", [pytest.param(4, marks=pytest.mark.slow), 2])
def test_tp_forward_parity(kv_heads):
    """TP=2 forward over a tensor-axis mesh == TP=1 single-device."""
    params, args, _ = _setup(kv_heads)
    batch, z, t, cl = args
    cfg1 = _tiny(kv_heads=kv_heads)
    want = VideoGPT(cfg1, dtype=jnp.float32).apply(params, batch, z, t, cl)

    cfg2 = _tiny(tp=2, kv_heads=kv_heads)
    params2 = tp_regroup_params(params, cfg2)
    mesh = _mesh(tensor=2)
    model2 = VideoGPT(cfg2, dtype=jnp.float32)
    with jax.sharding.set_mesh(mesh):
        sh = param_specs(params2, mesh, tp=True)
        params2 = jax.device_put(params2, sh)
        got = jax.jit(lambda p, z, t, cl: model2.apply(p, batch, z, t, cl))(
            params2, z, t, cl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_tp4_forward_parity():
    """tp=4: one head per shard (the degenerate extreme)."""
    params, args, _ = _setup()
    batch, z, t, cl = args
    want = VideoGPT(_tiny(), dtype=jnp.float32).apply(params, batch, z, t,
                                                      cl)
    cfg4 = _tiny(tp=4)
    params4 = tp_regroup_params(params, cfg4)
    mesh = _mesh(tensor=4)
    model4 = VideoGPT(cfg4, dtype=jnp.float32)
    with jax.sharding.set_mesh(mesh):
        params4 = jax.device_put(params4, param_specs(params4, mesh,
                                                      tp=True))
        got = jax.jit(lambda p, z, t, cl: model4.apply(p, batch, z, t, cl))(
            params4, z, t, cl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_tp_param_placement_rules():
    """The Megatron layout lands where it should: column-parallel kernels on
    the last dim, row-parallel on the contraction dim, norms replicated,
    ZeRO composing on a different dim."""
    params, _, _ = _setup()
    cfg2 = _tiny(tp=2)
    mesh = _mesh(tensor=2)
    sh = param_specs(tp_regroup_params(params, cfg2), mesh, tp=True,
                     zero=True)
    layers = sh["params"]["llm"]["layers"]
    qkv = tuple(layers["self_attn"]["qkv_proj"]["kernel"].spec)
    o = tuple(layers["self_attn"]["o_proj"]["kernel"].spec)
    gu = tuple(layers["mlp"]["gate_up_proj"]["kernel"].spec)
    dn = tuple(layers["mlp"]["down_proj"]["kernel"].spec)
    norm = tuple(layers["input_layernorm"]["weight"].spec)
    assert qkv[-1] == TENSOR_AXIS and gu[-1] == TENSOR_AXIS
    assert o[-2] == TENSOR_AXIS and dn[-2] == TENSOR_AXIS
    assert TENSOR_AXIS not in norm
    # ZeRO goes to a dim the TP sharding left alone
    assert "data" in qkv and qkv.index("data") != len(qkv) - 1


@pytest.mark.slow
def test_tp_grad_parity():
    """Gradients in the TP layout == regrouped gradients of the standard
    layout (regrouping is a permutation; autodiff must commute with it)."""
    params, args, _ = _setup()
    batch, z, t, cl = args
    cfg1, cfg2 = _tiny(), _tiny(tp=2)

    def loss1(p):
        out = VideoGPT(cfg1, dtype=jnp.float32).apply(p, batch, z, t, cl)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def loss2(p):
        out = VideoGPT(cfg2, dtype=jnp.float32).apply(p, batch, z, t, cl)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss1)(params)
    params2 = tp_regroup_params(params, cfg2)
    mesh = _mesh(tensor=2)
    with jax.sharding.set_mesh(mesh):
        g2 = jax.jit(jax.grad(loss2))(jax.device_put(
            params2, param_specs(params2, mesh, tp=True)))
    g2_std = tp_regroup_params(jax.tree.map(np.asarray, g2), cfg2,
                               inverse=True)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2_std)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


@pytest.mark.slow
def test_tp_cached_decode_parity():
    """prefill -> decode under a TP mesh == the plain single-device path
    (cache head-sharded over 'tensor' at rest)."""
    params, args, H = _setup()
    batch, z, t, cl = args
    n = tokens_per_frame(H, H)
    lay = frame_block_inference_layout(2, 1, n, use_cfg=True)
    prefix = lay.length - lay.noisy_tail_len()
    tail = lay.noisy_tail_len()

    def run(cfg, p, mesh=None):
        model = VideoGPT(cfg, dtype=jnp.float32)

        def f(p, z, t, cl):
            cache = model.apply(p, batch, cl, prefix,
                                method=VideoGPT.prefill)
            return model.apply(p, batch, z, t, cache, tail,
                               method=VideoGPT.decode)

        if mesh is None:
            return f(p, z, t, cl)
        with jax.sharding.set_mesh(mesh):
            return jax.jit(f)(p, z, t, cl)

    want = run(_tiny(), params)
    cfg2 = _tiny(tp=2)
    params2 = tp_regroup_params(params, cfg2)
    mesh = _mesh(tensor=2)
    params2 = jax.device_put(params2, param_specs(params2, mesh, tp=True))
    got = run(cfg2, params2, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_tp_with_ulysses_forward_parity():
    """TP x SP on a (1, 2, 2) mesh: heads sharded over BOTH axes, the a2a
    over 'seq' swapping within each tensor shard."""
    params, args, _ = _setup()
    batch, z, t, cl = args
    want = VideoGPT(_tiny(), dtype=jnp.float32).apply(params, batch, z, t,
                                                      cl)
    cfg = dataclasses.replace(_tiny(tp=2), seq_shard=True,
                              sp_attention="ulysses")
    params2 = tp_regroup_params(params, cfg)
    mesh = _mesh(seq=2, tensor=2)
    model = VideoGPT(cfg, dtype=jnp.float32)
    with jax.sharding.set_mesh(mesh):
        params2 = jax.device_put(params2, param_specs(params2, mesh,
                                                      tp=True))
        got = jax.jit(lambda p, z, t, cl: model.apply(p, batch, z, t, cl))(
            params2, z, t, cl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_cli_generate_mesh_tensor_smoke(tmp_path):
    """`cli generate --mesh_tensor 2` wires the TP mesh through to PNGs."""
    if len(jax.devices()) < 2:
        pytest.skip("needs fake CPU devices")
    from video_gpt_tpu.cli import build_parser
    args = build_parser().parse_args([
        "generate", "--video_path", "/root/reference/vids/plane.mp4",
        "--save_dir", str(tmp_path), "--clean_image_num", "2",
        "--gen_nums", "1", "--num_inference_steps", "2",
        "--max_input_image_size", "48", "--tiny_model", "--dtype", "fp32",
        "--mesh_tensor", "2", "--seed", "3"])
    args.func(args)
    import os
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


def test_detect_ckpt_tp(tmp_path):
    """Layout provenance: _detect_ckpt_tp reads the run's train_args.json;
    missing metadata = standard layout."""
    import json
    import os
    from video_gpt_tpu.cli import _detect_ckpt_tp
    run = tmp_path / "run"
    ckpts = run / "checkpoints"
    os.makedirs(ckpts)
    assert _detect_ckpt_tp(str(ckpts)) == 1  # no metadata -> standard
    with open(run / "train_args.json", "w") as f:
        json.dump({"model": {"tensor_parallel": "2"}}, f)
    assert _detect_ckpt_tp(str(ckpts)) == 2


def test_tp_regroup_touches_only_fused_columns():
    params, _, _ = _setup()
    cfg2 = _tiny(tp=2)
    grouped = tp_regroup_params(params, cfg2)
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(grouped)[0]
    changed = {jax.tree_util.keystr(p1) for (p1, l1), (_, l2)
               in zip(flat1, flat2)
               if not np.array_equal(np.asarray(l1), np.asarray(l2))}
    for key in changed:
        assert "qkv_proj" in key or "gate_up_proj" in key, key
    assert any("qkv_proj" in k for k in changed)
    assert any("gate_up_proj" in k for k in changed)
    # q/k/v group sizes are the model's head geometry
    assert sum(qkv_group_sizes(cfg2)) == (
        cfg2.num_heads + 2 * cfg2.num_kv_heads) * cfg2.head_dim
