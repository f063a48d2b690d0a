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
from video_gpt_tpu.models.video_gpt import VideoGPT
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
