"""Flow-matching Euler sampler, fully on-device.

Re-design of LVM/scheduler.py: the reference runs a Python/tqdm loop calling
the model per step (scheduler.py:168-204) with the KV cache disabled
(scheduler.py:174). Here the whole denoise trajectory is a ``lax.scan`` over a
precomputed sigma grid, and the model evaluation is the cached ``decode`` step
against a one-time clean-prefix ``prefill`` (see models/video_gpt.py).

Semantics preserved exactly:
- time-shifted grid  sigma = t / (t + s - s*t)  over linspace(0, 1, steps+1)
  (scheduler.py:124-130)
- x1-prediction -> velocity  (pred - z) / (1 - sigma)  (scheduler.py:180-186)
- CFG on the velocity: uncond + scale * (cond - uncond), result broadcast to
  both halves (scheduler.py:187-199)
- Euler update  z += (sigma_next - sigma) * v  (scheduler.py:200-204)
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig


def sigma_schedule(num_steps: int, time_shifting_factor: float = 1.0,
                   begin_time: Optional[float] = None) -> np.ndarray:
    """[num_steps + 1] sigma grid (LVM/scheduler.py:119-130)."""
    t = np.linspace(0.0 if begin_time is None else begin_time, 1.0,
                    num_steps + 1, dtype=np.float64)
    s = time_shifting_factor
    t = t / (t + s - s * t)
    return t.astype(np.float32)


def cfg_mix(pred: jax.Array, scale: float) -> jax.Array:
    """First half = cond, second half = uncond (frame-major). Returns the
    guided prediction broadcast back to both halves."""
    cond, uncond = jnp.split(pred, 2, axis=0)
    guided = uncond + scale * (cond - uncond)
    return jnp.concatenate([guided, guided], axis=0)


def sample(
    z0: jax.Array,
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    cfg: SchedulerConfig,
    use_cfg: bool = False,
    cfg_scale: float = 1.0,
    guidance_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> jax.Array:
    """Run the Euler ODE from noise to clip latents.

    z0: [N, hl, wl, C] initial noise per frame being generated (with CFG the
        first half are the conditional copies and must equal the second half).
    denoise_fn(z, t) -> model prediction with the same shape; t is [N].
    """
    sigmas = jnp.asarray(sigma_schedule(cfg.num_steps,
                                        cfg.time_shifting_factor,
                                        cfg.begin_time))
    guide = guidance_fn if guidance_fn is not None else (
        lambda v: cfg_mix(v, cfg_scale))

    def step(z, i):
        sigma = sigmas[i]
        sigma_next = sigmas[i + 1]
        t = jnp.full((z.shape[0],), sigma, z.dtype)
        pred = denoise_fn(z, t).astype(jnp.float32)  # integrate in fp32
        zf = z.astype(jnp.float32)
        if cfg.prediction_type == "x1":
            v = (pred - zf) / (1.0 - sigma)
            if use_cfg:
                v = guide(v)
        else:  # 'v': CFG applied on the raw velocity prediction
            # (LVM/model.py:554-562, OmniGen/model.py:359-372)
            v = guide(pred) if use_cfg else pred
        return (zf + (sigma_next - sigma) * v).astype(z.dtype), None

    z, _ = jax.lax.scan(step, z0, jnp.arange(cfg.num_steps))
    return z


def cfg_step_flags(cfg: SchedulerConfig) -> Tuple[bool, ...]:
    """Static per-step guidance flags for a CFG-interval schedule.

    ``cfg.cfg_interval = (lo, hi)`` applies guidance only on steps whose
    sigma lies in ``[lo, hi)``; outside it the unconditional evaluation is
    SKIPPED entirely (the guidance-interval schedule of Kynkaenniemi et al.
    2024, arXiv:2404.07724: guidance is harmful at high noise — sigma near
    0 here — and has little effect near the clean end). The sigma grid is
    static, so the flags are static Python booleans and the sampler simply
    compiles fewer unconditional forwards — the uncond row costs ~47% of
    every denoise step at flagship shapes (DESIGN.md decode breakdown).
    ``None`` (the default) preserves reference semantics: guidance at every
    step."""
    if cfg.cfg_interval is None:
        return (True,) * cfg.num_steps
    lo, hi = cfg.cfg_interval
    grid = sigma_schedule(cfg.num_steps, cfg.time_shifting_factor,
                          cfg.begin_time)
    return tuple(bool(lo <= s < hi) for s in grid[:cfg.num_steps])


def step_kinds(cfg: SchedulerConfig) -> Tuple[str, ...]:
    """Static per-step evaluation plan for the separate-CFG sampler.

    Combines two work-reduction schedules (both compile-time static because
    the sigma grid is static):

    - ``cfg.cfg_interval`` (see :func:`cfg_step_flags`): steps whose sigma
      falls outside the interval run the conditional context only
      (``'cond'``).
    - ``cfg.uncond_refresh = k``: among the guided steps, only every k-th
      (counting from the first guided step) actually EVALUATES the
      unconditional context (``'cfg'``); the steps in between reuse the
      cached unconditional prediction as the guidance baseline
      (``'cfg_reuse'``). This is feature-reuse caching restricted to the
      uncond branch (the lever behind DeepCache/TeaCache-style serving,
      Ma et al. 2023 arXiv:2312.00858, Liu et al. 2024 arXiv:2411.19108):
      the unconditional prediction drifts slowly across adjacent sigmas,
      and guidance only uses it as a direction baseline — the CONDITIONAL
      trunk still runs at every step, so this is NOT a step-count
      reduction. k=1 (default) evaluates uncond at every guided step
      (reference semantics).
    """
    return _kinds_from_flags(cfg_step_flags(cfg), cfg.uncond_refresh)


def _kinds_from_flags(guided: Tuple[bool, ...], k: int) -> Tuple[str, ...]:
    k = max(int(k or 1), 1)
    kinds = []
    since_eval = None  # guided steps since the last uncond evaluation
    for g in guided:
        if not g:
            kinds.append("cond")
            # leaving the guided region invalidates the cache: the first
            # step after RE-ENTERING guidance must evaluate fresh, never
            # reuse an uncond prediction cached many sigmas earlier
            since_eval = None
        elif since_eval is None or since_eval >= k:
            kinds.append("cfg")
            since_eval = 1
        else:
            kinds.append("cfg_reuse")
            since_eval += 1
    return tuple(kinds)


def _euler_fn(cfg: SchedulerConfig, sigmas: jax.Array):
    """step update closure: (z, i, fp32 pred) -> next z (z's dtype)."""
    def euler(z, i, pred):
        sigma = sigmas[i]
        zf = z.astype(jnp.float32)
        if cfg.prediction_type == "x1":
            v = (pred - zf) / (1.0 - sigma)
        else:
            v = pred
        return (zf + (sigmas[i + 1] - sigma) * v).astype(z.dtype)
    return euler


def _scan_step_plan(cfg: SchedulerConfig, kinds: Tuple[str, ...], fns: dict,
                    carry):
    """Run the static per-step plan with O(1) compiled segments.

    When the kind sequence has at most 3 contiguous runs (every k=1
    schedule), each run is one ``lax.scan`` segment; otherwise
    (uncond_refresh>1 alternates cfg/cfg_reuse, so per-run scans would
    compile ~num_steps length-1 segments each embedding a full model
    trace) ONE scan over all steps dispatches per step via ``lax.switch``
    on the static kind-id array — each occurring kind's body is traced
    exactly once and the TPU executes only the selected branch per step.
    Kinds that never occur compile no forward at all."""
    runs = []  # contiguous runs of equal kinds: (kind, start, end)
    start = 0
    while start < cfg.num_steps:
        end = start
        while end < cfg.num_steps and kinds[end] == kinds[start]:
            end += 1
        runs.append((kinds[start], start, end))
        start = end
    if len(runs) <= 3:
        # at most 3 runs for an interval schedule; exactly 1 when
        # cfg_interval=None and uncond_refresh=1
        for kind, s, e in runs:
            carry, _ = jax.lax.scan(fns[kind], carry, jnp.arange(s, e))
        return carry
    present = sorted({k for k, _, _ in runs})
    branches = [
        (lambda fn: lambda c, i: fn(c, i)[0])(fns[k]) for k in present]
    kind_ids = jnp.asarray([present.index(k) for k in kinds], jnp.int32)

    def body(c, i):
        return jax.lax.switch(kind_ids[i], branches, c, i), None

    carry, _ = jax.lax.scan(body, carry, jnp.arange(cfg.num_steps))
    return carry


def sample_separate_cfg(
    z0: jax.Array,
    denoise_pair_fn: Callable[[jax.Array, jax.Array],
                              Tuple[jax.Array, jax.Array]],
    cfg: SchedulerConfig,
    cfg_scale: float,
    denoise_cond_fn: Optional[Callable[[jax.Array, jax.Array],
                                       jax.Array]] = None,
) -> jax.Array:
    """Euler ODE with separate-CFG evaluation (OmniGen/model.py:376-402).

    Unlike :func:`sample` with ``use_cfg=True`` — where the CFG pair rides as
    one padded batch and every step pays attention/MLP over the uncond row's
    pad tokens — here ``denoise_pair_fn(z, t) -> (cond, uncond)`` runs the two
    contexts at their NATURAL lengths. Numerically identical to the padded
    pair (guidance is affine in the prediction, so guiding x1-predictions and
    guiding velocities commute).

    With ``cfg.cfg_interval`` set, steps outside the interval evaluate ONLY
    the conditional context via ``denoise_cond_fn`` (falls back to taking
    the cond half of the pair). With ``cfg.uncond_refresh = k > 1``, guided
    steps between uncond refreshes reuse the cached unconditional prediction
    (see :func:`step_kinds`).

    Compilation structure: when the static kind sequence has at most 3
    contiguous runs (every k=1 schedule), each run is one ``lax.scan``
    segment; otherwise (k>1 alternates cfg/cfg_reuse) ONE scan over all
    steps dispatches per step via ``lax.switch`` on the static kind array —
    segment count and model-forward trace count stay O(1) in ``num_steps``
    either way, and kinds that never occur compile no forward at all.

    z0: [N, hl, wl, C] — single copy, no duplicated halves.
    """
    sigmas = jnp.asarray(sigma_schedule(cfg.num_steps,
                                        cfg.time_shifting_factor,
                                        cfg.begin_time))
    kinds = step_kinds(cfg)
    euler = _euler_fn(cfg, sigmas)

    def guide(z, i, cond, uncond):
        pred = (uncond.astype(jnp.float32)
                + cfg_scale * (cond.astype(jnp.float32)
                               - uncond.astype(jnp.float32)))
        return euler(z, i, pred)

    def eval_cond(z, t):
        if denoise_cond_fn is not None:
            return denoise_cond_fn(z, t)
        return denoise_pair_fn(z, t)[0]

    # carry = (z, cached uncond prediction); the cache slot is dead weight
    # on 'cond' segments but keeps the scan carry structure uniform. The
    # cached uncond is stored in z0's dtype so the carry structure never
    # depends on the pair fn's output dtype (guide() upcasts to fp32 when
    # consuming it anyway).
    def step_cfg(carry, i):
        z, _ = carry
        t = jnp.full((z.shape[0],), sigmas[i], z.dtype)
        cond, uncond = denoise_pair_fn(z, t)
        return (guide(z, i, cond, uncond), uncond.astype(z0.dtype)), None

    def step_cfg_reuse(carry, i):
        z, u_cache = carry
        t = jnp.full((z.shape[0],), sigmas[i], z.dtype)
        cond = eval_cond(z, t)
        return (guide(z, i, cond, u_cache), u_cache), None

    def step_cond(carry, i):
        z, u_cache = carry
        t = jnp.full((z.shape[0],), sigmas[i], z.dtype)
        cond = eval_cond(z, t)
        return (euler(z, i, cond.astype(jnp.float32)), u_cache), None

    fns = {"cfg": step_cfg, "cfg_reuse": step_cfg_reuse, "cond": step_cond}
    carry = (z0, jnp.zeros_like(z0))
    return _scan_step_plan(cfg, kinds, fns, carry)[0]


def sample_separate_multi(
    z0: jax.Array,
    denoise_fns: Sequence[Callable[[jax.Array, jax.Array], jax.Array]],
    combine: Callable[[Sequence[jax.Array]], jax.Array],
    cfg: SchedulerConfig,
) -> jax.Array:
    """Euler ODE where EACH guidance context evaluates separately at its
    natural length and ``combine(preds) -> pred`` mixes them — the 3-way
    text/image CFG of the OmniGen ancestor run in its separate-CFG form
    (OmniGen/model.py:376-402, the reference default
    ``separate_cfg_infer=True``, OmniGen/pipeline.py:147). Unlike the
    padded batch, no context pays attention over another's pad tokens.
    ``combine`` receives fp32 predictions in ``denoise_fns`` order, with
    ``denoise_fns[0]`` the CONDITIONAL context.

    The serving schedules compose like :func:`sample_separate_cfg`
    (:func:`step_kinds` gives the static plan):

    - ``cfg.cfg_interval``: steps whose sigma falls outside the interval
      evaluate ONLY the conditional context and use its prediction raw.
    - ``cfg.uncond_refresh = k``: guided steps between refreshes evaluate
      only the conditional context and reuse the cached predictions of all
      OTHER contexts as the guidance baselines.

    Compilation structure matches sample_separate_cfg: one ``lax.scan``
    segment per contiguous kind-run when there are at most 3 runs, else a
    single scan with ``lax.switch`` on the static kind array — O(1)
    segments and per-kind traces in ``num_steps``.
    """
    sigmas = jnp.asarray(sigma_schedule(cfg.num_steps,
                                        cfg.time_shifting_factor,
                                        cfg.begin_time))
    kinds = step_kinds(cfg)
    euler = _euler_fn(cfg, sigmas)

    # carry = (z, tuple of cached aux-context predictions in z0's dtype)
    def step_cfg(carry, i):
        z, _ = carry
        t = jnp.full((z.shape[0],), sigmas[i], z.dtype)
        preds = [fn(z, t).astype(jnp.float32) for fn in denoise_fns]
        cache = tuple(p.astype(z0.dtype) for p in preds[1:])
        return (euler(z, i, combine(preds)), cache), None

    def step_cfg_reuse(carry, i):
        z, cache = carry
        t = jnp.full((z.shape[0],), sigmas[i], z.dtype)
        cond = denoise_fns[0](z, t).astype(jnp.float32)
        preds = [cond] + [c.astype(jnp.float32) for c in cache]
        return (euler(z, i, combine(preds)), cache), None

    def step_cond(carry, i):
        z, cache = carry
        t = jnp.full((z.shape[0],), sigmas[i], z.dtype)
        cond = denoise_fns[0](z, t).astype(jnp.float32)
        return (euler(z, i, cond), cache), None

    fns = {"cfg": step_cfg, "cfg_reuse": step_cfg_reuse, "cond": step_cond}
    carry = (z0, tuple(jnp.zeros_like(z0) for _ in denoise_fns[1:]))
    return _scan_step_plan(cfg, kinds, fns, carry)[0]


def add_noise_x1(x1: jax.Array, x0: jax.Array, t: jax.Array) -> jax.Array:
    """Rectified-flow interpolation x_t = t*x1 + (1-t)*x0; t==1 is clean
    (LVM/train_helper/loss.py:175-181)."""
    t = t.reshape((-1,) + (1,) * (x1.ndim - 1)).astype(x1.dtype)
    return t * x1 + (1.0 - t) * x0
