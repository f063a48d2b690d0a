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
TENSOR_AXIS = "tensor"   # Megatron-style TP: heads / MLP features
PIPE_AXIS = "pipe"       # GPipe PP: layer-stack stages


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = cfg.num_devices
    assert len(devices) >= n, (len(devices), n)
    grid = np.asarray(devices[:n]).reshape(cfg.data, cfg.seq, cfg.tensor,
                                           cfg.pipe)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS, TENSOR_AXIS, PIPE_AXIS))


def axis_size(axis: str) -> int:
    """Size of ``axis`` in the ambient mesh (1 when absent / no mesh)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        return int(mesh.shape.get(axis, 1))
    except Exception:
        return 1


def maybe_axis(axis: str, mesh=None) -> Optional[str]:
    """``axis`` if present in the (given or ambient) mesh, else None —
    lets PartitionSpecs mention optional axes without breaking 2-axis
    meshes built directly by callers (tests_tpu kernels)."""
    if mesh is None:
        try:
            mesh = jax.sharding.get_abstract_mesh()
        except Exception:
            return None
    return axis if axis in mesh.shape else None


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


# Megatron TP placement by module name (phi3.Phi3Attention / Phi3Mlp).
# Column-parallel: fused-projection OUTPUT features over 'tensor' (the
# fused columns are stored TP-GROUPED — ModelConfig.tensor_parallel — so
# the block sharding is exactly per-shard [q_i|k_i|v_i] / [gate_i|up_i]).
# Row-parallel: contraction dim over 'tensor'; the partial sums resolve
# into GSPMD all-reduces at the layer-boundary activation constraint.
_TP_COL_MODULES = ("qkv_proj", "gate_up_proj")
_TP_ROW_MODULES = ("o_proj", "down_proj")


def param_specs(tree, mesh: Mesh, tp: bool = False, pp: bool = False,
                zero: bool = False):
    """NamedShardings for a param-shaped tree (params / EMA / optimizer
    moments — optax moment trees carry the same param path names).

    - ``tp``: Megatron tensor parallelism over 'tensor' (column-parallel
      kernels/lora_b on the last dim; row-parallel kernels/lora_a on the
      contraction dim).
    - ``pp``: layer-stack leading (nn.scan) axis over 'pipe'.
    - ``zero``: ZeRO-style sharding over 'data' of the first remaining
      divisible dim (DeepSpeed stage 1/2/3 analogue)."""
    ntp = int(mesh.shape.get(TENSOR_AXIS, 1))
    npp = int(mesh.shape.get(PIPE_AXIS, 1))
    nd = int(mesh.shape[DATA_AXIS])

    def spec(path, leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        names = [p.key for p in path if hasattr(p, "key")]
        leaf_name = names[-1] if names else ""
        parts = [None] * leaf.ndim
        if tp and ntp > 1:
            col = any(m in names for m in _TP_COL_MODULES)
            row = any(m in names for m in _TP_ROW_MODULES)
            if col and leaf_name in ("kernel", "lora_b") \
                    and leaf.shape[-1] % ntp == 0:
                parts[-1] = TENSOR_AXIS
            elif row and leaf_name in ("kernel", "lora_a") \
                    and leaf.ndim >= 2 and leaf.shape[-2] % ntp == 0:
                parts[-2] = TENSOR_AXIS
        if pp and npp > 1 and "layers" in names \
                and parts[0] is None and leaf.shape[0] % npp == 0:
            parts[0] = PIPE_AXIS
        if zero:
            for d, size in enumerate(leaf.shape):
                if parts[d] is None and size % nd == 0 and size >= nd:
                    parts[d] = DATA_AXIS
                    break
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map_with_path(spec, tree)


def place_train_state(state, mesh: Mesh, zero_params: bool = False,
                      tp: bool = False, pp: bool = False):
    """device_put a TrainState in ONE pass with its final shardings
    (params/EMA replicated unless tp/pp/ZeRO-3 shard them; optimizer state
    always ZeRO-sharded over 'data'). A replicate-then-reshard two-step
    would transiently materialise the full optimizer state on every device
    — an OOM in exactly the regime ZeRO exists for.

    ``zero_params`` (ZeRO-3, MeshConfig.zero_params): params and EMA are
    ALSO sharded over 'data' at rest; the SPMD partitioner inserts the
    per-use all-gathers inside the step, trading a layer's gather traffic
    for holding only 1/data of every weight — the GSPMD form of the
    reference's DeepSpeed stage-3 partitioning
    (LVM/acceleration/config/stage3_offload_bf16_dp.json).

    ``tp`` / ``pp``: Megatron / GPipe placement (see :func:`param_specs`);
    params, EMA AND the optimizer moments follow the same layout."""
    pspec = param_specs(state.params, mesh, tp=tp, pp=pp, zero=zero_params)
    shardings = state._replace(
        step=replicated(mesh),
        params=pspec,
        opt_state=param_specs(state.opt_state, mesh, tp=tp, pp=pp,
                              zero=True),
        ema_params=(param_specs(state.ema_params, mesh, tp=tp, pp=pp,
                                zero=zero_params)
                    if state.ema_params is not None else None))
    return jax.device_put(state, shardings)


def constrain_cache(cache, enable: bool = True):
    """KVCache [layers, B, H_kv, L, Dp]: shard the HEADS over
    ``(tensor, seq)`` (tensor-major) — head-sharded at rest, so the decode
    step's all_to_alls only ever move the tail
    (parallel.ulysses.ulysses_attend_cached) and each tensor shard holds
    only its own heads. Tensor-major matches the all_to_all's head
    grouping: the a2a over 'seq' splits the LOCAL (per-tensor-shard) head
    block, so global head = tensor-block major, seq-chunk minor. No-op
    off-mesh."""
    if not enable or not _mesh_active():
        return cache
    axes = tuple(a for a in (TENSOR_AXIS, SEQ_AXIS) if axis_size(a) > 1)
    head_part = axes if len(axes) > 1 else (axes[0] if axes else None)
    spec = P(None, None, head_part, None, None)
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


def constrain_replicated(x: jax.Array, enable: bool = True) -> jax.Array:
    """Constrain to fully replicated when running under a mesh.

    Used on the flat frame-token value streams feeding VideoGPT._assemble's
    [B, L]-indexed takes: every (data, seq) shard of the token stream takes
    arbitrary rows, so the values must be whole on each device — one
    explicit all-gather here beats GSPMD's 'involuntary full
    rematerialization' fallback (replicate + repartition EVERY step) that
    the unannotated takes triggered on the dp x sp x tp mesh
    (MULTICHIP_r04: ZeRO-3 propagation offered the values feature-sharded
    over 'data')."""
    if not enable or not _mesh_active():
        return x
    return jax.lax.with_sharding_constraint(x, P())
