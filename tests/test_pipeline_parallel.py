"""GPipe pipeline parallelism: trunk/forward/grad parity, trainer wiring.

The reference has no PP (DeepSpeed ZeRO + Ulysses only, LVM/acceleration/*);
this is a TPU-native addition: the nn.scan layer stack's leading axis is
staged over the mesh's 'pipe' axis and microbatches flow over ppermute
(parallel/pipeline.py). Parity must be exact up to float reassociation:
pipelining reorders nothing within a microbatch.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import MeshConfig, ModelConfig, TrainConfig
from video_gpt_tpu.layout import RowSpec, build_layout, tokens_per_frame
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.parallel.mesh import PIPE_AXIS, make_mesh, param_specs
from video_gpt_tpu.parallel.pipeline import pp_apply

CFG = ModelConfig.tiny(attn_impl="reference")


def _mesh(data=1, pipe=2):
    if len(jax.devices()) < data * pipe:
        pytest.skip("needs fake CPU devices")
    return make_mesh(MeshConfig(data=data, pipe=pipe))


def _training_setup(rows=2):
    """A [rows]-row training batch + perturbed params."""
    model = VideoGPT(CFG, dtype=jnp.float32, train_init=True)
    n = tokens_per_frame(48, 48)
    lay = build_layout([RowSpec((1, 2, 1), "training") for _ in range(rows)],
                       n)
    batch = Batch.from_layout(lay)
    nn_, nc = lay.num_noisy_frames, lay.num_clean_frames
    hl = wl = 6
    z = jax.random.normal(jax.random.PRNGKey(3), (nn_, hl, wl, 4))
    cl = jax.random.normal(jax.random.PRNGKey(4), (nc, hl, wl, 4))
    t = jax.random.uniform(jax.random.PRNGKey(5), (nn_,))
    params = model.init(jax.random.PRNGKey(1), batch, z, t, cl)
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
              for l, r in zip(leaves, rngs)]
    return model, jax.tree.unflatten(treedef, leaves), batch, z, t, cl


@pytest.mark.slow
def test_pp_apply_matches_plain_forward_off_mesh():
    """pp == 1 (no mesh): pp_apply is numerically the plain forward."""
    model, params, batch, z, t, cl = _training_setup()
    want = model.apply(params, batch, z, t, cl)
    got = pp_apply(model, params, batch, z, t, cl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "num_micro", [2, pytest.param(None, marks=pytest.mark.slow)])
def test_pp_forward_parity(num_micro):
    """2-stage pipeline over a 'pipe' mesh == the plain forward."""
    model, params, batch, z, t, cl = _training_setup(rows=2)
    want = model.apply(params, batch, z, t, cl)
    mesh = _mesh(pipe=2)
    with jax.sharding.set_mesh(mesh):
        p = jax.device_put(params, param_specs(params, mesh, pp=True))
        got = jax.jit(lambda p, z, t, cl: pp_apply(
            model, p, batch, z, t, cl, num_micro=num_micro))(p, z, t, cl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pp4_forward_parity():
    """4-stage pipeline (one layer per stage), microbatches > stages."""
    import dataclasses
    cfg = dataclasses.replace(ModelConfig.tiny(attn_impl="reference"),
                              num_layers=4)
    model = VideoGPT(cfg, dtype=jnp.float32, train_init=True)
    n = tokens_per_frame(48, 48)
    lay = build_layout([RowSpec((1, 2, 1), "training") for _ in range(4)],
                       n)
    batch = Batch.from_layout(lay)
    nn_, nc = lay.num_noisy_frames, lay.num_clean_frames
    z = jax.random.normal(jax.random.PRNGKey(3), (nn_, 6, 6, 4))
    cl = jax.random.normal(jax.random.PRNGKey(4), (nc, 6, 6, 4))
    t = jax.random.uniform(jax.random.PRNGKey(5), (nn_,))
    params = model.init(jax.random.PRNGKey(1), batch, z, t, cl)
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(treedef, [
        l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
        for l, r in zip(leaves, rngs)])
    want = model.apply(params, batch, z, t, cl)
    mesh = _mesh(pipe=4)
    with jax.sharding.set_mesh(mesh):
        p = jax.device_put(params, param_specs(params, mesh, pp=True))
        got = jax.jit(lambda p, z, t, cl: pp_apply(
            model, p, batch, z, t, cl, num_micro=4))(p, z, t, cl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pp_uncached_sampler_parity():
    """PP serving, first cut: the full SAMPLER on the uncached
    full-sequence path (the reference's own serving algorithm — KV cache
    disabled, LVM/scheduler.py:174) with the trunk pipelined over 'pipe'
    == the plain single-device sampler. The CFG pair's two rows are the
    two microbatches. The cached decode path stays non-PP (README
    parity map)."""
    from video_gpt_tpu.config import SchedulerConfig
    from video_gpt_tpu.layout import frame_block_inference_layout
    from video_gpt_tpu.sampling.scheduler import sample

    model = VideoGPT(CFG, dtype=jnp.float32)
    n = tokens_per_frame(48, 48)
    lay = frame_block_inference_layout(2, 1, n, use_cfg=True)
    batch = Batch.from_layout(lay)
    hl = wl = 6
    z0 = jax.random.normal(jax.random.PRNGKey(3), (2, hl, wl, 4))
    cl = jax.random.normal(jax.random.PRNGKey(4), (2, hl, wl, 4))
    params = model.init(jax.random.PRNGKey(1), batch, z0,
                        jnp.zeros((2,)), cl)
    sched = SchedulerConfig(num_steps=3, prediction_type="x1")

    def run(denoise_builder):
        def clip(p, z0, cl):
            return sample(z0, denoise_builder(p, cl), sched, use_cfg=True,
                          cfg_scale=1.5)
        return clip

    want = run(lambda p, cl: lambda z, t: model.apply(
        p, batch, z, t, cl))(params, z0, cl)
    mesh = _mesh(pipe=2)
    with jax.sharding.set_mesh(mesh):
        p = jax.device_put(params, param_specs(params, mesh, pp=True))
        got = jax.jit(run(lambda p, cl: lambda z, t: pp_apply(
            model, p, batch, z, t, cl, num_micro=2)))(p, z0, cl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pp_grad_parity():
    """Gradients through the ppermute pipeline == plain-forward gradients
    (ppermute transposes to the reverse permutation; the bubble's garbage
    compute is masked to zero cotangents)."""
    model, params, batch, z, t, cl = _training_setup(rows=4)

    def loss_plain(p):
        out = model.apply(p, batch, z, t, cl)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def loss_pp(p):
        out = pp_apply(model, p, batch, z, t, cl, num_micro=2)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss_plain)(params)
    mesh = _mesh(data=2, pipe=2)
    with jax.sharding.set_mesh(mesh):
        p = jax.device_put(params, param_specs(params, mesh, pp=True))
        g2 = jax.jit(jax.grad(loss_pp))(p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_pp_remat_forward_parity():
    """Gradient checkpointing inside the stage body (the nn.remat policy
    of the non-PP path) changes nothing numerically."""
    import dataclasses
    cfg = dataclasses.replace(CFG, remat=True)
    model, params, batch, z, t, cl = _training_setup(rows=2)
    model_r = VideoGPT(cfg, dtype=jnp.float32, train_init=True)
    want = model.apply(params, batch, z, t, cl)
    mesh = _mesh(pipe=2)
    with jax.sharding.set_mesh(mesh):
        p = jax.device_put(params, param_specs(params, mesh, pp=True))
        f = jax.jit(lambda p, z, t, cl: jax.grad(
            lambda pp_: jnp.mean(pp_apply(
                model_r, pp_, batch, z, t, cl) ** 2))(p))
        g = f(p, z, t, cl)
        got = pp_apply(model_r, p, batch, z, t, cl)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pp_rejects_tp_and_sp():
    import dataclasses
    model, params, batch, z, t, cl = _training_setup(rows=2)
    mesh = _mesh(pipe=2)
    bad = VideoGPT(dataclasses.replace(CFG, sp_attention="ulysses"),
                   dtype=jnp.float32)
    with jax.sharding.set_mesh(mesh):
        with pytest.raises(ValueError, match="data parallelism"):
            pp_apply(bad, params, batch, z, t, cl)


@pytest.mark.slow
def test_trainer_pipeline_parallel(tmp_path):
    """Trainer over a (data=2, pipe=2) mesh: layer stack staged over
    'pipe' at rest, two steps run, loss finite."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 CPU devices")
    from video_gpt_tpu.models.vae import VAEConfig
    from video_gpt_tpu.training.trainer import Trainer
    cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                      mixed_precision="no", lr=1e-3, lr_scheduler="constant",
                      log_every=1, ckpt_every=1000,
                      batch_size_per_device=2,  # rows shard over 'data';
                      # each data shard holds whole microbatches
                      results_dir=str(tmp_path))
    t = Trainer(ModelConfig.tiny(attn_impl="reference",
                                 pos_embed_max_size=192),
                cfg, "/root/reference/vids", vae_cfg=VAEConfig.tiny(),
                target_resolution=(48, 64),
                mesh_cfg=MeshConfig(data=2, pipe=2))
    state = t.run(2)
    assert int(state.step) == 2
    qkv = state.params["params"]["llm"]["layers"]["self_attn"]["qkv_proj"][
        "kernel"]
    assert tuple(qkv.sharding.spec)[0] == PIPE_AXIS
    assert np.isfinite(float(jax.tree.leaves(state.params)[0].sum()))


def test_trainer_pp_rejects_bad_combos(tmp_path):
    from video_gpt_tpu.models.vae import VAEConfig
    from video_gpt_tpu.training.trainer import Trainer
    if len(jax.devices()) < 4:
        pytest.skip("needs fake CPU devices")
    cfg = TrainConfig(frame_num=4, results_dir=str(tmp_path))
    with pytest.raises(ValueError, match="data parallelism only"):
        Trainer(ModelConfig.tiny(), cfg, "/root/reference/vids",
                vae_cfg=VAEConfig.tiny(), target_resolution=(48, 64),
                mesh_cfg=MeshConfig(seq=2, pipe=2))
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(ModelConfig.tiny(num_layers=3), cfg, "/root/reference/vids",
                vae_cfg=VAEConfig.tiny(), target_resolution=(48, 64),
                mesh_cfg=MeshConfig(pipe=2))
