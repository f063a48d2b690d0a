"""Device mesh + sharding rules.

Replaces the reference's process-group bookkeeping (LVM/acceleration/
parallel_states.py: global COMM_INFO singletons, dist.new_group per SP slice)
and the DeepSpeed ZeRO configs (LVM/acceleration/config/*.json) with one
Mesh and sharding annotations; XLA's SPMD partitioner inserts the
collectives (all-to-all / all-gather / reduce-scatter) over ICI.

Axes:
- ``data``: batch / gradient sharding (ZeRO-style optimizer-state sharding)
- ``seq``: sequence-parallel axis — activations [B, L, D] constrained to
  P('data', 'seq', None) between layers; the attention itself goes through
  the EXPLICIT shard_map Ulysses all-to-all in ``parallel.ulysses`` when
  ``ModelConfig.sp_attention == 'ulysses'`` (the counterpart of
  LVM/transform/sdpa_transform.py:126-159).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = cfg.num_devices
    assert len(devices) >= n, (len(devices), n)
    grid = np.asarray(devices[:n]).reshape(cfg.data, cfg.seq)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def zero_sharding(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """ZeRO-style sharding spec for optimizer state: shard the first
    axis-divisible dimension of each leaf over ``axis``; replicate the rest.
    Equivalent in memory effect to DeepSpeed ZeRO-1/2 partitioning
    (stage2_bf16_dp.json), but expressed declaratively."""
    n = mesh.shape[axis]

    def spec(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        parts = [None] * leaf.ndim
        for d, size in enumerate(leaf.shape):
            if size % n == 0 and size >= n:
                parts[d] = axis
                break
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(spec, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, L, ...] batches: rows over data, sequence over seq."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))


def place_train_state(state, mesh: Mesh, zero_params: bool = False):
    """device_put a TrainState in ONE pass with its final shardings
    (params/EMA replicated, optimizer state ZeRO-sharded over 'data').
    A replicate-then-reshard two-step would transiently materialise the
    full optimizer state on every device — an OOM in exactly the regime
    ZeRO exists for.

    ``zero_params`` (ZeRO-3, MeshConfig.zero_params): params and EMA are
    ALSO sharded over 'data' at rest; the SPMD partitioner inserts the
    per-use all-gathers inside the step, trading a layer's gather traffic
    for holding only 1/data of every weight — the GSPMD form of the
    reference's DeepSpeed stage-3 partitioning
    (LVM/acceleration/config/stage3_offload_bf16_dp.json)."""
    repl = replicated(mesh)
    shardings = jax.tree.map(lambda _: repl, state,
                             is_leaf=lambda x: hasattr(x, "shape"))
    shardings = shardings._replace(
        opt_state=zero_sharding(state.opt_state, mesh))
    if zero_params:
        shardings = shardings._replace(
            params=zero_sharding(state.params, mesh))
        if state.ema_params is not None:
            shardings = shardings._replace(
                ema_params=zero_sharding(state.ema_params, mesh))
    return jax.device_put(state, shardings)


def constrain_cache(cache, enable: bool = True):
    """KVCache [layers, B, H_kv, L, Dp]: shard the HEADS over ``seq`` —
    head-sharded at rest, so the decode step's all_to_alls only ever move
    the tail (parallel.ulysses.ulysses_attend_cached). No-op off-mesh."""
    if not enable or not _mesh_active():
        return cache
    spec = P(None, None, SEQ_AXIS, None, None)
    return type(cache)(*(jax.lax.with_sharding_constraint(x, spec)
                         for x in cache))


def _mesh_active() -> bool:
    """True when a mesh with our axes is in scope — an explicit check so
    real with_sharding_constraint failures PROPAGATE instead of being
    swallowed by a blanket no-mesh fallback (which would silently leave
    e.g. the KV cache unsharded)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        return SEQ_AXIS in mesh.shape
    except Exception:
        return False


def constrain_activations(x: jax.Array, enable: bool = True) -> jax.Array:
    """Constrain [B, L, D] activations to P(data, seq, None) when running
    under a mesh; no-op otherwise. Applied at decoder-layer boundaries."""
    if not enable or not _mesh_active():
        return x
    return jax.lax.with_sharding_constraint(x, P(DATA_AXIS, SEQ_AXIS, None))
