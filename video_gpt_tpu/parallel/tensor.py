"""Megatron-style tensor parallelism: layouts and checkpoint conversion.

TPU-native counterpart of Megatron-LM's column/row-parallel linear pair —
which the reference does NOT implement (its parallelism is DeepSpeed ZeRO +
Ulysses SP, LVM/acceleration/*); TP is built here because on a TPU pod slice
it is the natural way to fit models past one chip's HBM while keeping the
MXU busy: kernels are sharded over the mesh's ``tensor`` axis and GSPMD
inserts the two all-reduces per layer (after o_proj and down_proj) over ICI.

Layout contract (see ModelConfig.tensor_parallel): the fused projections
store their output columns TP-GROUPED —

  qkv_proj.kernel    [D, tp * (h/tp + 2*hkv/tp) * d]  per-shard [q_i|k_i|v_i]
  gate_up_proj.kernel[D, tp * (2*I/tp)]               per-shard [gate_i|up_i]

so a block-contiguous sharding of the last dim over ``tensor`` puts exactly
shard i's heads/features on device i with ZERO resharding inside the layer
(the standard fused order [Q|K|V] / [gate|up] would split misaligned with
the shard boundaries and force a per-layer activation all-to-all). Head
order is preserved: tp-major grouping re-merges to the global head index.
Row-parallel weights (o_proj, down_proj) need no regrouping — their
contraction rows are already head-major contiguous.

Checkpoints in the standard fused order (the torch importer's output, any
``tensor_parallel=1`` run) convert losslessly with
:func:`tp_regroup_params` / ``inverse=True``.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import TENSOR_AXIS, axis_size


def active_tp_degree() -> int:
    """Size of the ambient mesh's ``tensor`` axis (1 when no mesh)."""
    return axis_size(TENSOR_AXIS)


def regroup_columns(w, sizes: Sequence[int], tp: int, axis: int = -1,
                    inverse: bool = False):
    """Reorder concatenated feature groups along ``axis`` between the
    standard order [A|B|C] and the tp-grouped order [A0|B0|C0|A1|B1|C1|…].

    ``sizes`` are the standard-order group widths (each divisible by tp).
    Works on numpy or jax arrays; pure reordering — exactly inverted by
    ``inverse=True``."""
    if tp == 1:
        return w
    total = sum(sizes)
    assert w.shape[axis] == total, (w.shape, axis, sizes)
    for s in sizes:
        assert s % tp == 0, (s, tp)
    xp = jnp if isinstance(w, jax.Array) else np
    # standard-order index of each tp-grouped column
    order = np.concatenate([
        np.arange(off + i * (s // tp), off + (i + 1) * (s // tp))
        for i in range(tp)
        for off, s in zip(np.cumsum([0] + list(sizes[:-1])), sizes)
    ])
    if inverse:
        order = np.argsort(order)
    return xp.take(w, xp.asarray(order), axis=axis)


def qkv_group_sizes(cfg) -> tuple:
    """Standard fused-qkv column group widths (q, k, v)."""
    d = cfg.head_dim
    return (cfg.num_heads * d, cfg.num_kv_heads * d, cfg.num_kv_heads * d)


def tp_regroup_params(params, cfg, tp: int = None, inverse: bool = False):
    """Convert a param tree between the standard fused layout
    (``tensor_parallel=1`` / torch-imported checkpoints) and the tp-grouped
    layout a ``tensor_parallel=tp`` model computes with.

    Touches only ``qkv_proj.{kernel, lora_b}`` and ``gate_up_proj.kernel``
    last-dim column order; every other leaf (o_proj / down_proj rows are
    head-major contiguous either way) passes through untouched. Safe on
    nn.scan-stacked trees (the feature dim stays last)."""
    tp = cfg.tensor_parallel if tp is None else tp
    if tp == 1:
        return params
    qkv_sizes = qkv_group_sizes(cfg)
    gu_sizes = (cfg.intermediate_size, cfg.intermediate_size)

    def convert(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if not names or not hasattr(leaf, "shape"):
            return leaf
        leaf_name = names[-1]
        if "qkv_proj" in names and leaf_name in ("kernel", "lora_b"):
            return regroup_columns(leaf, qkv_sizes, tp, inverse=inverse)
        if "gate_up_proj" in names and leaf_name == "kernel":
            return regroup_columns(leaf, gu_sizes, tp, inverse=inverse)
        return leaf

    return jax.tree_util.tree_map_with_path(convert, params)
