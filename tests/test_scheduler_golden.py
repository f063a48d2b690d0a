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
