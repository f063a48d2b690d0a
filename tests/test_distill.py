"""Progressive step-distillation (training/distill.py).

The reference has no distillation path (it serves at 50 Euler steps,
inference_nv.sh:30); these tests pin the math this framework adds:
grid alignment, the Euler-inversion target, and that a distillation
round actually closes the student->teacher gap.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import ModelConfig, SchedulerConfig, TrainConfig
from video_gpt_tpu.layout import RowSpec, build_layout
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.sampling.scheduler import sample, sigma_schedule
from video_gpt_tpu.training.distill import (distillation_loss,
                                            make_distill_train_step,
                                            teacher_rollout)
from video_gpt_tpu.training.train_state import init_train_state

from test_training import _inputs

CFG = ModelConfig.tiny(attn_impl="reference")


def _model_and_params(layout, inputs, train_init=False, seed=0):
    """Init + perturb: the DiT head is zero-initialised by convention
    (LVM/model.py:240-244 / models/embedders.FinalLayer), so a fresh model
    predicts exactly 0 and every distillation identity would hold
    trivially. Gaussian noise on all float leaves makes the prediction a
    real function of (z, t)."""
    model = VideoGPT(CFG, dtype=jnp.float32, train_init=train_init)
    params = model.init(jax.random.PRNGKey(seed), inputs.batch, inputs.x1,
                        jnp.zeros((layout.num_noisy_frames,)),
                        inputs.clean_latents)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed + 100), len(leaves))
    leaves = [x + 0.05 * jax.random.normal(k, x.shape, x.dtype)
              if jnp.issubdtype(x.dtype, jnp.floating) else x
              for k, x in zip(keys, leaves)]
    return model, jax.tree.unflatten(treedef, leaves)


def test_student_grid_subsamples_teacher_grid():
    """sigma_schedule(S*m)[::m] == sigma_schedule(S): the time-shift map is
    pointwise, so the student's grid points are exactly every m-th teacher
    point — the alignment the target inversion relies on."""
    for shift in (1.0, 3.0):
        for s, m in ((5, 2), (4, 3)):
            fine = sigma_schedule(s * m, shift)
            coarse = sigma_schedule(s, shift)
            np.testing.assert_allclose(fine[::m], coarse, atol=1e-7)


@pytest.mark.slow
def test_substep1_target_is_teacher_pred():
    """With substeps=1 the Euler inversion is exact: the target collapses to
    the teacher's own prediction, so a student sharing the teacher's weights
    has ~zero distillation loss (fp32 rounding only)."""
    layout, inputs = _inputs()
    model, params = _model_and_params(layout, inputs)
    loss, aux = distillation_loss(
        model, params, params, jax.random.PRNGKey(1), inputs,
        max_blocks=3, student_steps=6, substeps=1)
    assert float(loss) < 1e-8, float(loss)


@pytest.mark.slow
def test_teacher_rollout_matches_sampler():
    """teacher_rollout over the FULL grid from pure noise == the production
    sampler (sampling/scheduler.sample) on the same schedule — pins the
    x1->velocity conversion and Euler update to LVM/scheduler.py:180-204."""
    layout, inputs = _inputs()
    model, params = _model_and_params(layout, inputs)
    steps = 4
    z0 = jax.random.normal(jax.random.PRNGKey(7), inputs.x1.shape)
    sig = jnp.asarray(sigma_schedule(steps))

    ref = sample(z0, lambda z, t: model.apply(params, inputs.batch, z, t,
                                              inputs.clean_latents),
                 SchedulerConfig(num_steps=steps))
    start = jnp.zeros((inputs.x1.shape[0],), jnp.int32)
    out = teacher_rollout(model.apply, params, inputs.batch, z0,
                          inputs.clean_latents, sig, start, steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_distill_step_closes_the_gap():
    """A student initialised from the teacher has a nonzero 2-substep gap;
    distillation steps shrink it. Teacher stays frozen (it rides as an
    argument), EMA updates, step counts.

    lr=1e-3 here is the PRETRAINING lr; the distill recipe must override it
    with distill_lr (default 1e-4) — at 1e-3 Adam's scale-invariant first
    step blasts the near-converged student 80x off the teacher (measured)
    and the gap never halves. This test therefore also pins the
    continue-from-teacher LR guard."""
    layout, inputs = _inputs()
    model, teacher = _model_and_params(layout, inputs)
    tcfg = TrainConfig(lr=1e-3, lr_scheduler="constant", use_ema=True,
                       distill=True, distill_student_steps=4,
                       distill_substeps=2)
    state = init_train_state(model, jax.tree.map(jnp.copy, teacher), tcfg)
    step = jax.jit(make_distill_train_step(model, tcfg, max_blocks=3))
    losses = []
    for _ in range(8):
        state, m = step(state, teacher, jax.random.PRNGKey(3), inputs)
        losses.append(float(m["loss"]))
    assert losses[0] > 1e-7, "expected a real teacher->student gap"
    assert losses[-1] < 0.5 * losses[0], losses
    assert state.ema_params is not None
    assert int(state.step) == 8
    assert all(np.isfinite(losses)), losses


@pytest.mark.slow
def test_endpoint_weighting_is_landed_mse():
    """distill_loss_weight='endpoint' must equal the MSE between the
    student's landed one-Euler-step endpoint and the teacher's landed z':
    per-frame w = ((s_next-s)/(1-s))^2 exactly cancels the target
    inversion's amplification."""
    layout, inputs = _inputs()
    model, params = _model_and_params(layout, inputs)
    # student = perturbed teacher so the losses are nonzero
    _, student = _model_and_params(layout, inputs, seed=5)
    kw = dict(max_blocks=3, student_steps=4, substeps=2)
    lu, _ = distillation_loss(model, student, params, jax.random.PRNGKey(2),
                              inputs, loss_weight="uniform", **kw)
    le, _ = distillation_loss(model, student, params, jax.random.PRNGKey(2),
                              inputs, loss_weight="endpoint", **kw)
    # weights are in (0, 1], so the endpoint loss is strictly smaller but
    # still a real signal
    assert 0.0 < float(le) < float(lu)
    with pytest.raises(ValueError, match="distill_loss_weight"):
        distillation_loss(model, student, params, jax.random.PRNGKey(2),
                          inputs, loss_weight="bogus", **kw)


def test_distill_rejects_input_output_return():
    with pytest.raises(ValueError, match="input_output_return"):
        make_distill_train_step(
            VideoGPT(CFG, dtype=jnp.float32),
            TrainConfig(distill=True, input_output_return=True),
            max_blocks=3)


@pytest.mark.slow
def test_trainer_distill_smoke(tmp_path):
    """Trainer --distill end-to-end: teacher in the base-params slot, the
    student trains from a copy, two steps run through real video data."""
    from video_gpt_tpu.models.vae import VAEConfig
    from video_gpt_tpu.training.trainer import Trainer
    cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                      mixed_precision="no", lr=1e-3, lr_scheduler="constant",
                      log_every=1, ckpt_every=1000, distill=True,
                      distill_student_steps=4, distill_substeps=2,
                      results_dir=str(tmp_path))
    t = Trainer(ModelConfig.tiny(attn_impl="reference",
                                 pos_embed_max_size=192), cfg,
                "/root/reference/vids", vae_cfg=VAEConfig.tiny(),
                target_resolution=(48, 64))
    state = t.run(2)
    assert int(state.step) == 2
    # the teacher (base-params slot) must be a distinct buffer tree from the
    # donated student state
    assert t._base_params is not None

# ---------------------------------------------------------------------------
# guidance distillation (distill_guidance): bake uncond + w*(cond - uncond)
# into the student so serving needs no unconditional row (arXiv:2210.03142)


def _guided_inputs(frame_blocks=(1, 2, 1), rows=1, n_img=4, hl=4, wl=4,
                   seed=0):
    """_inputs() + the uncond-scheme batch riding in batch_uncond."""
    layout, inputs = _inputs(frame_blocks, rows, n_img, hl, wl, seed)
    layout_u = build_layout([RowSpec(tuple(frame_blocks), "uncond")
                             for _ in range(rows)], n_img)
    return layout, layout_u, inputs._replace(
        batch_uncond=Batch.from_layout(layout_u))


def test_uncond_scheme_noisy_order_matches_training_scheme():
    """The 'uncond' layout enumerates noisy frames in exactly the training
    scheme's (row, block, frame) order — the invariant that lets the guided
    teacher feed the SAME z/t arrays to both branches."""
    for blocks in ((1, 2, 1), (2, 3), (4,)):
        lay_c = build_layout([RowSpec(blocks, "training")] * 2, 4)
        lay_u = build_layout([RowSpec(blocks, "uncond")] * 2, 4)
        assert lay_u.num_noisy_frames == lay_c.num_noisy_frames
        assert lay_u.num_clean_frames == 0
        np.testing.assert_array_equal(lay_u.noisy_frame_row,
                                      lay_c.noisy_frame_row)
        np.testing.assert_array_equal(lay_u.noisy_frame_block,
                                      lay_c.noisy_frame_block)
        np.testing.assert_array_equal(lay_u.noisy_video_frame,
                                      lay_c.noisy_video_frame)


@pytest.mark.slow
def test_uncond_scheme_matches_serving_uncond_rows():
    """Each block of an 'uncond' row behaves exactly like the serving CFG
    unconditional layout [0, fb] (frame_block_inference_layout(0, fb, n)):
    no visible context and RoPE-relative positions, so predictions match a
    standalone row's to fp32 tolerance."""
    from video_gpt_tpu.layout import frame_block_inference_layout
    blocks = (2, 3)
    n_img, hl, wl = 4, 4, 4
    layout, layout_u, inputs = _guided_inputs(blocks, n_img=n_img,
                                              hl=hl, wl=wl)
    model, params = _model_and_params(layout, inputs)
    batch_u = Batch.from_layout(layout_u)
    nn_ = layout_u.num_noisy_frames
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(nn_, hl, wl, 4)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.1, 0.9, size=(nn_,)).astype(np.float32))
    empty = inputs.clean_latents[:0]
    pred = np.asarray(model.apply(params, batch_u, z, t, empty))

    off = 0
    for fb in blocks:
        lay_s = frame_block_inference_layout(0, fb, n_img, use_cfg=False)
        batch_s = Batch.from_layout(lay_s)
        ref = model.apply(params, batch_s, z[off:off + fb], t[off:off + fb],
                          empty)
        np.testing.assert_allclose(pred[off:off + fb], np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        off += fb


@pytest.mark.slow
def test_guided_distill_w1_matches_plain():
    """cfg_scale=1.0 makes the guided teacher collapse to the conditional
    branch (uncond + 1*(cond - uncond) == cond), so the guided loss equals
    the plain distillation loss."""
    layout, _, inputs = _guided_inputs()
    model, teacher = _model_and_params(layout, inputs)
    _, student = _model_and_params(layout, inputs, seed=5)
    kw = dict(max_blocks=3, student_steps=4, substeps=2)
    lp, _ = distillation_loss(model, student, teacher,
                              jax.random.PRNGKey(2), inputs, **kw)
    lg, _ = distillation_loss(model, student, teacher,
                              jax.random.PRNGKey(2), inputs,
                              cfg_scale=1.0, **kw)
    np.testing.assert_allclose(float(lg), float(lp), rtol=1e-5)


def test_guided_distill_requires_uncond_batch():
    layout, inputs = _inputs()
    model, params = _model_and_params(layout, inputs)
    with pytest.raises(ValueError, match="batch_uncond"):
        distillation_loss(model, params, params, jax.random.PRNGKey(1),
                          inputs, max_blocks=3, student_steps=4,
                          cfg_scale=1.5)


@pytest.mark.slow
def test_guided_distill_closes_the_gap():
    """Guidance distillation at w=1.5: the student (= teacher copy) starts
    at a real gap — its conditional-only prediction vs the teacher's GUIDED
    rollout — and the distill steps shrink it."""
    layout, _, inputs = _guided_inputs()
    model, teacher = _model_and_params(layout, inputs)
    tcfg = TrainConfig(lr=1e-3, lr_scheduler="constant",
                       distill=True, distill_student_steps=4,
                       distill_substeps=2, distill_guidance=1.5)
    state = init_train_state(model, jax.tree.map(jnp.copy, teacher), tcfg)
    step = jax.jit(make_distill_train_step(model, tcfg, max_blocks=3))
    losses = []
    for _ in range(8):
        state, m = step(state, teacher, jax.random.PRNGKey(3), inputs)
        losses.append(float(m["loss"]))
    assert losses[0] > 1e-7, "expected a real guided-teacher gap"
    assert losses[-1] < 0.5 * losses[0], losses
    assert all(np.isfinite(losses)), losses


def test_collate_uncond_batch():
    """collate(uncond=True) rides the uncond-scheme layout with identical
    noisy-frame order and a partition-independent length (F*seg), so the
    jitted guided step compiles once per geometry."""
    from video_gpt_tpu.training.data import collate

    class _S:
        def __init__(self, blocks, F, rng):
            self.frame_blocks = blocks
            self.pixels = rng.normal(size=(F, 8, 8, 3)).astype(np.float32)

    rng = np.random.default_rng(0)
    F, n_img = 4, 4
    for blocks in ((1, 2, 1), (2, 2), (4,)):
        tb = collate([_S(blocks, F, rng)] * 2, n_img, uncond=True)
        bu = tb.inputs.batch_uncond
        assert bu is not None
        assert bu.input_ids.shape == (2, F * (n_img + 2))
        assert bu.noisy_gather.shape[0] == tb.inputs.batch.noisy_gather.shape[0]
    # default: no uncond batch built
    assert collate([_S((4,), F, rng)], n_img).inputs.batch_uncond is None


@pytest.mark.slow
def test_trainer_rejects_guidance_without_distill(tmp_path):
    from video_gpt_tpu.models.vae import VAEConfig
    from video_gpt_tpu.training.trainer import Trainer
    cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                      mixed_precision="no", distill=False,
                      distill_guidance=1.5, results_dir=str(tmp_path))
    t = Trainer(ModelConfig.tiny(attn_impl="reference",
                                 pos_embed_max_size=192), cfg,
                "/root/reference/vids", vae_cfg=VAEConfig.tiny(),
                target_resolution=(48, 64))
    with pytest.raises(ValueError, match="distill_guidance"):
        t.run(1)


@pytest.mark.slow
def test_trainer_guided_distill_smoke(tmp_path):
    """Trainer --distill --distill_guidance end-to-end: collate rides the
    uncond layout, the guided teacher evaluates both branches, two steps
    run through real video data."""
    from video_gpt_tpu.models.vae import VAEConfig
    from video_gpt_tpu.training.trainer import Trainer
    cfg = TrainConfig(frame_num=4, frame_block_scheme="frame_block",
                      mixed_precision="no", lr=1e-3, lr_scheduler="constant",
                      log_every=1, ckpt_every=1000, distill=True,
                      distill_student_steps=4, distill_substeps=2,
                      distill_guidance=1.5, results_dir=str(tmp_path))
    t = Trainer(ModelConfig.tiny(attn_impl="reference",
                                 pos_embed_max_size=192), cfg,
                "/root/reference/vids", vae_cfg=VAEConfig.tiny(),
                target_resolution=(48, 64))
    state = t.run(2)
    assert int(state.step) == 2
