"""Sampler math vs the reference LVMScheduler (oracle import).

Pins the sigma grid and the full Euler/CFG trajectory: given the same mock
model prediction, our jitted lax.scan sampler must produce the same latents
as the reference's Python loop (LVM/scheduler.py:119-208).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_gpt_tpu.config import SchedulerConfig
from video_gpt_tpu.sampling.scheduler import sample, sigma_schedule

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_sched(ref):
    import LVM.scheduler as s
    return s


@pytest.mark.parametrize("steps,shift,begin", [
    (50, 1.0, None),
    (10, 3.0, None),
    (20, 1.0, 0.25),
])
def test_sigma_grid_matches_reference(ref_sched, steps, shift, begin):
    ref = ref_sched.LVMScheduler(num_steps=steps, time_shifting_factor=shift,
                                 begin_time=begin)
    mine = sigma_schedule(steps, shift, begin)
    np.testing.assert_allclose(mine, ref.sigma.numpy(), atol=1e-6)


@pytest.mark.parametrize("use_cfg,scale", [(False, 1.0), (True, 1.7)])
def test_euler_x1_trajectory_matches_reference(ref_sched, use_cfg, scale):
    """Same deterministic mock prediction on both sides -> same z after all
    steps (x1-prediction -> velocity conversion, CFG mixing, Euler update)."""
    steps = 7
    rng = np.random.default_rng(0)
    n = 4 if use_cfg else 2
    z0 = rng.normal(size=(n, 2, 3, 4)).astype(np.float32)
    w = rng.normal(size=(1, 2, 3, 4)).astype(np.float32)

    # mock model: pred = tanh(z) * w + t (deterministic, shape-preserving)
    def mock_pred_np(z, t):
        return np.tanh(z) * w + t.reshape(-1, 1, 1, 1)

    # reference side: LVMScheduler.__call__ with a func returning (pred, None)
    class Func:
        def __call__(self, z, timesteps, past_key_values=None,
                     prediction_type="x1", **kw):
            pred = torch.from_numpy(
                mock_pred_np(z.numpy(), timesteps.numpy()))
            return pred, None

    sched = ref_sched.LVMScheduler(num_steps=steps, time_shifting_factor=1.0)
    model_kwargs = {"use_img_cfg": use_cfg, "img_cfg_scale": scale}
    z_ref = sched(torch.from_numpy(z0.copy()), Func(), model_kwargs,
                  use_kv_cache=False, prediction_type="x1").numpy()

    # our side
    def denoise(z, t):
        return jnp.tanh(z) * jnp.asarray(w) + t.reshape(-1, 1, 1, 1)

    cfg = SchedulerConfig(num_steps=steps, prediction_type="x1")
    z_mine = sample(jnp.asarray(z0), denoise, cfg, use_cfg=use_cfg,
                    cfg_scale=scale)
    np.testing.assert_allclose(np.asarray(z_mine), z_ref,
                               atol=1e-5, rtol=1e-5)


def test_separate_multi_schedules_match_hand_rolled_loop():
    """sample_separate_multi with 3 guidance contexts under combined
    cfg_interval x uncond_refresh schedules: matches a hand-rolled Euler
    loop implementing the same reuse plan, with cheap toy denoise fns
    (the image-gen 3-way CFG serving path)."""
    from video_gpt_tpu.sampling.scheduler import (sample_separate_multi,
                                                  sigma_schedule, step_kinds)

    rng = np.random.default_rng(0)
    z0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    ws = [0.7, -0.3, 0.2]

    def make_fn(w):
        return lambda z, t: jnp.tanh(z) * w + t.reshape(-1, 1, 1, 1)

    fns = [make_fn(w) for w in ws]
    cfg_s, img_s = 2.0, 1.5

    def combine(preds):
        cond, uncond, img = preds
        return uncond + img_s * (img - uncond) + cfg_s * (cond - img)

    for pred_type in ("v", "x1"):
        for ival, k in [(None, 1), (None, 3), ((0.1, 0.8), 2),
                        ((0.2, 0.6), 1)]:
            sched = SchedulerConfig(num_steps=8, prediction_type=pred_type,
                                    cfg_interval=ival, uncond_refresh=k)
            out = sample_separate_multi(z0, fns, combine, sched)

            kinds = step_kinds(sched)
            sig = sigma_schedule(8)
            z = z0
            cache = None
            for i in range(8):
                t = jnp.full((1,), sig[i], z.dtype)
                cond = fns[0](z, t).astype(jnp.float32)
                if kinds[i] == "cfg":
                    cache = [f(z, t).astype(z0.dtype) for f in fns[1:]]
                if kinds[i] == "cond":
                    pred = cond
                else:
                    pred = combine([cond] + [c.astype(jnp.float32)
                                             for c in cache])
                zf = z.astype(jnp.float32)
                v = ((pred - zf) / (1.0 - sig[i]) if pred_type == "x1"
                     else pred)
                z = (zf + (sig[i + 1] - sig[i]) * v).astype(z.dtype)
            np.testing.assert_allclose(np.asarray(out), np.asarray(z),
                                       atol=1e-6, rtol=1e-6,
                                       err_msg=f"{pred_type} {ival} k={k}")
