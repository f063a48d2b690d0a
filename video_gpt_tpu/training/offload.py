"""Host-offloaded AdamW: full-depth single-chip training.

The TPU analogue of the reference's DeepSpeed ZeRO-offload configs
(LVM/acceleration/config/stage3_offload_bf16_dp.json:10-19): the f32
optimizer state (AdamW mu/nu + the f32 master copy of the params) lives in
HOST memory (`memory_kind='pinned_host'`), and the per-step AdamW update
runs as host compute (`jax.experimental.compute_on('device_host')`). Only
the bf16 params and transient gradients touch HBM, so the full-depth
3.8B/32-layer train step fits one v5e (15.75G):

    bf16 params 7.6G  (device)           f32 master 15.2G  (host)
    bf16 grads  (streamed d2h)           f32 mu+nu  30.4G  (host)

The step is a two-phase EAGER orchestrator, not one jit program:

1. a jitted fwd+bwd whose gradients are device_put to pinned_host inside
   the program (grads leave HBM instead of pinning a full 7.6G tree
   there);
2. one small jitted host-update per parameter CHUNK (cached by
   shape/dtype), mu/nu/master donated in place, the refreshed bf16 chunk
   returned to device and concatenated per leaf.

A single fused program was measured to OOM: XLA keeps every leaf's d2h
relayout copy and every HostExecute output staged in HBM simultaneously
(21G), and python-float constants inside the host block broadcast to full
leaf shape as f32 DEVICE temps (84G). Phase-splitting bounds the overlap
to one leaf at a time. Even per-leaf is not enough at 3.8B scale: the
host-compute partitioner still stages ~5 f32 DEVICE broadcasts of the
full operand shape per update program (measured: 5 x 3G for one
(32, 8192, 3072) scan-stacked trunk leaf = 15G of HLO temps -> OOM on
its own), so leaves above :data:`CHUNK_BYTES_F32` are split along axis 0
and updated chunk-by-chunk, bounding any single program's staging to a
few hundred MB. The stale bf16 device params are additionally freed
(``.delete()``) between the grad and update phases — once gradients
exist only the f32 host master matters, and holding the old 7G tree
while the new one grows would put ~14G of params in HBM at once.

AdamW semantics (clip-by-global-norm -> scale_by_adam -> weight decay ->
lr schedule) replicate ``train_state.make_optimizer``'s optax chain;
parity is asserted by tests/test_offload.py against the on-device optax
step. EMA/MultiSteps are not supported (neither does the reference's
offload recipe use them).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import compute_on
from jax.sharding import SingleDeviceSharding

from ..config import TrainConfig
from ..models.video_gpt import VideoGPT
from .loss import LossInputs, training_loss
from .train_state import lr_schedule


class OffloadState(NamedTuple):
    """AdamW state, host-resident (count lives on device: it is O(1)).

    mu/nu/master mirror the param tree, except each leaf is a TUPLE of
    axis-0 chunks (a 1-tuple for small leaves) — see :func:`chunk_sizes`.
    ``jax.tree`` utilities flatten through the tuples transparently."""

    count: jax.Array
    mu: Any
    nu: Any
    master: Any  # f32 master params


# Upper bound on the f32 bytes of one host-update operand. One update
# program's HBM staging overhead is ~5 f32 broadcasts of the operand
# shape (see module docstring), so 384M here bounds it to ~2G.
CHUNK_BYTES_F32 = 384 << 20


def chunk_sizes(shape: tuple, elem_f32_bytes: int = 4) -> tuple:
    """Axis-0 chunk lengths for a leaf of ``shape`` such that each chunk
    is at most :data:`CHUNK_BYTES_F32` as f32 (1-chunk for small leaves;
    scalars and vectors under the bound are never split)."""
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    if not shape or shape[0] <= 1 or n * elem_f32_bytes <= CHUNK_BYTES_F32:
        return (shape[0] if shape else 1,)
    # Pick k from the per-ROW size so the LARGEST balanced chunk respects
    # the bound (ceil-div on total bytes can overshoot: 3 rows x 200MB gives
    # k=2 -> a 400MB chunk). rows_per_chunk = how many rows fit the bound;
    # if even one row exceeds it, axis-0 splitting can do no better than
    # one row per chunk.
    row_bytes = (n // shape[0]) * elem_f32_bytes
    rows_per_chunk = max(1, CHUNK_BYTES_F32 // max(row_bytes, 1))
    k = min(shape[0], -(-shape[0] // rows_per_chunk))  # ceil div
    base, rem = divmod(shape[0], k)
    return tuple(base + (1 if i < rem else 0) for i in range(k))


def _split_axis0(x, sizes):
    """jnp split of ``x`` into the given axis-0 chunk lengths."""
    if len(sizes) == 1:
        return (x,)
    bounds = np.cumsum(sizes)[:-1].tolist()
    return tuple(jnp.split(x, bounds, axis=0))


def _on_cpu(device=None) -> bool:
    return (device or jax.devices()[0]).platform == "cpu"


def host_sharding(device=None) -> SingleDeviceSharding:
    """Host memory on TPU. On the CPU backend host==device physically and
    `compute_on('device_host')` deadlocks (measured), so tests run the same
    step with default-memory shardings — the optimizer math is identical,
    only the placement differs."""
    device = device or jax.devices()[0]
    if _on_cpu(device):
        return SingleDeviceSharding(device)
    return SingleDeviceSharding(device, memory_kind="pinned_host")


def device_sharding(device=None) -> SingleDeviceSharding:
    device = device or jax.devices()[0]
    if _on_cpu(device):
        return SingleDeviceSharding(device)
    return SingleDeviceSharding(device, memory_kind="device")


def init_offload_state(params: Any, device=None) -> OffloadState:
    """Build the host-resident f32 master/mu/nu from (possibly bf16) device
    params. Cast + transfer run leaf-by-leaf under jit so no full f32 copy
    of the tree ever materialises in HBM (the largest scan-stacked leaf
    alone is ~6.4G f32 at 3.8B scale).

    NOTE: the transfer is a device_put INSIDE the jit, not an
    out_shardings=: on this JAX, out_shardings-produced arrays report
    pinned_host in .sharding but NOT in their aval (jax.typeof), and
    tracing uses the aval — a later step would then reject host+device
    mixing."""
    host = host_sharding(device)
    inner = params["params"] if "params" in params else params

    # chunked cast/zero: the f32 copy of a chunk (not the whole leaf) is
    # the largest device temp, and each chunk lands on host immediately
    casters: dict = {}

    def cast(x):
        key = (x.shape, str(x.dtype))
        if key not in casters:
            sizes = chunk_sizes(x.shape)
            casters[key] = jax.jit(lambda a: tuple(
                jax.device_put(c.astype(jnp.float32), host)
                for c in _split_axis0(a, sizes)))
        return casters[key](x)

    def zero(x):
        sizes = chunk_sizes(x.shape)
        if len(sizes) == 1:
            return (jax.device_put(jnp.zeros(x.shape, jnp.float32), host),)
        return tuple(
            jax.device_put(jnp.zeros((s,) + x.shape[1:], jnp.float32), host)
            for s in sizes)

    is_leaf = lambda x: hasattr(x, "shape")
    return OffloadState(
        count=jnp.zeros((), jnp.int32),
        mu=jax.tree.map(zero, inner, is_leaf=is_leaf),
        nu=jax.tree.map(zero, inner, is_leaf=is_leaf),
        master=jax.tree.map(cast, inner, is_leaf=is_leaf),
    )


def repin_offload_state(state: OffloadState, device=None) -> OffloadState:
    """Re-assert host placement on a RESTORED OffloadState.

    Orbax's StandardRestore is not trusted to reproduce the pinned_host
    memory kind on this backend (the same aval-vs-.sharding mismatch the
    init docstring records would make a wrong placement invisible until
    the cached update programs reject host+device mixing — or the 45.6G
    f32 state OOMs HBM at 3.8B). device_put is a no-op for leaves already
    host-resident; a mis-placed leaf moves one <=CHUNK_BYTES_F32 chunk at
    a time (the leaves are chunk tuples), never the whole tree."""
    host = host_sharding(device)
    dev = device_sharding(device)
    pin = lambda x: jax.device_put(x, host)
    return OffloadState(
        count=jax.device_put(state.count, dev),
        mu=jax.tree.map(pin, state.mu),
        nu=jax.tree.map(pin, state.nu),
        master=jax.tree.map(pin, state.master),
    )


def make_offload_train_step(model: VideoGPT, cfg: TrainConfig,
                            max_blocks: int, device=None,
                            prediction_target: str = "x1",
                            grad_splits: int = 1) -> Callable:
    """Eager (params, ostate, rng, inputs) -> (params, ostate, metrics).

    ``params`` is the bf16 (or f32) device tree ``{'params': ...}``;
    ``ostate`` an :class:`OffloadState` from :func:`init_offload_state`.
    Do NOT wrap the returned callable in jax.jit — it orchestrates several
    jitted programs and donates the host state buffers itself. BOTH
    ``ostate`` AND ``params`` are consumed: mu/nu/master update in place,
    and the stale device param buffers are freed mid-step (use the
    returned tree).

    ``grad_splits > 1`` computes the gradients in that many backward
    passes, each accumulating only ~1/N of the param tree (the other
    leaves get no grad accumulator at all): the bf16 grad accumulators
    of a 3.8B model are 7.6G of HLO temps, which together with the 7.0G
    bf16 params overshoot one v5e by ~0.4G — two passes bound the live
    accumulators to the largest group (~4G) at the price of recomputing
    the forward, which is noise next to the host-update time. Identical
    rng per pass keeps the trajectory bit-identical to one pass
    (tests/test_offload.py pins this).
    """
    if cfg.gradient_accumulation_steps > 1:
        raise ValueError("offload step does not support MultiSteps")
    if grad_splits < 1:
        raise ValueError(f"grad_splits must be >= 1, got {grad_splits}")
    host = host_sharding(device)
    dev = device_sharding(device)
    sched = lr_schedule(cfg)
    b1, b2 = cfg.adam_beta1, cfg.adam_beta2
    eps, wd = cfg.adam_epsilon, cfg.adam_weight_decay
    on_cpu = _on_cpu(device)

    def _loss_fn(p, rng, inputs):
        return training_loss(
            model, {"params": p}, rng, inputs, max_blocks=max_blocks,
            input_noise=cfg.input_noise,
            input_output_return=cfg.input_output_return,
            prediction_target=prediction_target)

    # Lazily-built grad passes (need the param treedef): each entry is
    # (active_idx, frozen_idx, jitted_fn) where the fn differentiates ONLY
    # the active leaves and returns their grads d2h'd to host.
    # The d2h is a device_put INSIDE the jit (not an out_shardings=): only
    # this form stamps the host space into the result avals —
    # out_shardings-produced arrays report pinned_host in .sharding but
    # not in jax.typeof, and the update programs would then reject
    # host+device mixing.
    grad_passes: list = []

    def _build_grad_passes(flat, treedef):
        n = len(flat)
        if grad_splits == 1:
            groups = [list(range(n))]
        else:
            order = sorted(range(n), key=lambda i: -flat[i].nbytes)
            totals = [0] * min(grad_splits, n)
            groups = [[] for _ in totals]
            for i in order:
                gi = totals.index(min(totals))
                groups[gi].append(i)
                totals[gi] += flat[i].nbytes
            groups = [g for g in groups if g]

        for active_idx in groups:
            active_set = set(active_idx)
            frozen_idx = [i for i in range(n) if i not in active_set]

            def gfn(active, frozen, rng, inputs, _a=tuple(active_idx),
                    _f=tuple(frozen_idx)):
                def loss_of_active(act):
                    leaves = [None] * n
                    for i, leaf in zip(_a, act):
                        leaves[i] = leaf
                    for i, leaf in zip(_f, frozen):
                        leaves[i] = leaf
                    return _loss_fn(jax.tree.unflatten(treedef, leaves),
                                    rng, inputs)

                (loss, aux), g = jax.value_and_grad(
                    loss_of_active, has_aux=True)(active)
                gss = optax.global_norm(g) ** 2
                # grads leave as HOST CHUNKS matching the state layout
                return ((loss, aux["per_frame_loss"], gss),
                        [tuple(jax.device_put(c, host) for c in
                               _split_axis0(x, chunk_sizes(x.shape)))
                         for x in g])

            grad_passes.append((active_idx, frozen_idx, jax.jit(gfn)))

    def _compute_grads(inner, rng, inputs):
        """Run the grad pass(es); returns (metrics, grads-on-host)."""
        flat, treedef = jax.tree.flatten(inner)
        if not grad_passes:
            _build_grad_passes(flat, treedef)
        all_g = [None] * len(flat)
        gss_total = jnp.zeros((), jnp.float32)
        metrics = None
        for active_idx, frozen_idx, fn in grad_passes:
            active = [flat[i] for i in active_idx]
            frozen = [flat[i] for i in frozen_idx]
            (loss, pfl, gss), g = fn(active, frozen, rng, inputs)
            for i, leaf in zip(active_idx, g):
                all_g[i] = leaf
            gss_total = gss_total + gss.astype(jnp.float32)
            if metrics is None:  # identical rng -> identical loss per pass
                metrics = {"loss": loss, "per_frame_loss": pfl}
        metrics["grad_norm"] = jnp.sqrt(gss_total)
        return metrics, jax.tree.unflatten(treedef, all_g)

    # per-(shape, dtype) host-update programs; mu/nu/master donated
    update_cache: dict = {}

    def _update_fn():
        # EVERY scalar rides as a host-resident 0-d ARGUMENT, never as a
        # python float or a closed-over array: a bare constant inside the
        # host block is materialised by XLA as an f32 DEVICE broadcast of
        # the FULL leaf shape before the host call (measured twice: 5 such
        # broadcasts x 3-6G per trunk leaf — instant OOM at 3.8B scale).
        def f(g, mu, nu, m, clip_h, bc1_h, bc2_h, lr_h,
              b1_h, b1c_h, b2_h, b2c_h, eps_h, wd_h):
            def math():
                g32 = g.astype(jnp.float32) * clip_h
                mu2 = b1_h * mu + b1c_h * g32
                nu2 = b2_h * nu + b2c_h * (g32 * g32)
                mhat = mu2 / bc1_h
                vhat = nu2 / bc2_h
                m2 = m - lr_h * (mhat / (jnp.sqrt(vhat) + eps_h)
                                 + wd_h * m)
                return mu2, nu2, m2, m2.astype(g.dtype)

            if on_cpu:
                mu2, nu2, m2, p2 = math()
            else:
                with compute_on.compute_on("device_host"):
                    mu2, nu2, m2, p2 = math()
            return (jax.device_put(mu2, host), jax.device_put(nu2, host),
                    jax.device_put(m2, host), jax.device_put(p2, dev))

        # donate ONLY the state leaves (each aliases a same-shaped host
        # output, so mu/nu/master update in place). Donating the grad —
        # a host input with no aliased output — SIGABRTs this compiler
        # (fusion_util.cc: m_space == kHbm || kCmem check); its buffer is
        # freed by refcount right after the call instead.
        return jax.jit(f, donate_argnums=(1, 2, 3))

    # hyperparameter constants as 0-d HOST arrays, passed as update args
    _hyper_h = tuple(jax.device_put(jnp.asarray(x, jnp.float32), host)
                     for x in (b1, 1.0 - b1, b2, 1.0 - b2, eps, wd))

    # per-(chunk shapes, dtype) device concat programs for reassembly
    concat_cache: dict = {}

    def _concat(chunks):
        if len(chunks) == 1:
            return chunks[0]
        key = (tuple(c.shape for c in chunks), str(chunks[0].dtype))
        if key not in concat_cache:
            concat_cache[key] = jax.jit(
                lambda *cs: jnp.concatenate(cs, axis=0))
        return concat_cache[key](*chunks)

    def step(params, ostate: OffloadState, rng: jax.Array,
             inputs: LossInputs):
        # NO donation on the grad passes: donating device inputs in a
        # program with host-space outputs fails to compile on this stack
        # ("Unimplemented DMA from hbm to hbm"), and it would buy nothing
        # — the outputs are in a different memory space anyway.
        inner = params["params"]
        metrics, grads = _compute_grads(inner, rng, inputs)

        count = ostate.count + 1  # optax bias correction uses the
        bc1 = 1.0 - b1 ** count   # post-increment count
        bc2 = 1.0 - b2 ** count
        # optax.clip_by_global_norm semantics: scale only when over the cap
        clip = jnp.minimum(1.0, cfg.max_grad_norm / jnp.maximum(
            metrics["grad_norm"], 1e-12)).astype(jnp.float32)
        lr = jnp.asarray(sched(ostate.count), jnp.float32)
        clip_h, bc1_h, bc2_h, lr_h = (
            jax.device_put(x.astype(jnp.float32), host)
            for x in (clip, bc1, bc2, lr))

        # The stale device params are DEAD once gradients exist (the f32
        # host master is the source of truth); free them now so old+new
        # bf16 trees (~14G together at 3.8B) never coexist in HBM. PjRt
        # defers the actual free past any still-pending consumer.
        for x in jax.tree.leaves(inner):
            x.delete()

        is_chunks = lambda x: isinstance(x, tuple)
        flat_g, treedef = jax.tree.flatten(grads, is_leaf=is_chunks)
        flat_mu = jax.tree.leaves(ostate.mu, is_leaf=is_chunks)
        flat_nu = jax.tree.leaves(ostate.nu, is_leaf=is_chunks)
        flat_m = jax.tree.leaves(ostate.master, is_leaf=is_chunks)
        new_mu, new_nu, new_m, new_p = [], [], [], []
        for gs, mus, nus, ms in zip(flat_g, flat_mu, flat_nu, flat_m):
            mu_c, nu_c, m_c, p_c = [], [], [], []
            for g, mu, nu, m in zip(gs, mus, nus, ms):
                key = (g.shape, str(g.dtype))
                if key not in update_cache:
                    update_cache[key] = _update_fn()
                mu2, nu2, m2, p2 = update_cache[key](g, mu, nu, m, clip_h,
                                                     bc1_h, bc2_h, lr_h,
                                                     *_hyper_h)
                mu_c.append(mu2)
                nu_c.append(nu2)
                m_c.append(m2)
                p_c.append(p2)
            new_mu.append(tuple(mu_c))
            new_nu.append(tuple(nu_c))
            new_m.append(tuple(m_c))
            new_p.append(_concat(p_c))

        unf = lambda leaves: jax.tree.unflatten(treedef, leaves)
        return ({"params": unf(new_p)},
                OffloadState(count, unf(new_mu), unf(new_nu), unf(new_m)),
                metrics)

    return step
