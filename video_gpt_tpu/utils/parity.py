"""Numerical-divergence probes.

Structural replacement for the reference's manual SP-rank equality checker
(``is_all_equal``, LVM/train_helper/loss.py:14-54) which it used to debug
cross-rank noise divergence. On TPU+JAX determinism is structural (one PRNG
key, SPMD), so the probes here compare pytrees / per-device shards and are
used in tests and multi-host bring-up rather than inside the train loop.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def max_tree_diff(a: Any, b: Any) -> float:
    """Max |a - b| across all leaves of two pytrees."""
    diffs = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(
            jnp.asarray(x, jnp.float32) - jnp.asarray(y, jnp.float32))))
        if hasattr(x, "shape") and np.prod(np.shape(x)) else 0.0, a, b)
    leaves = jax.tree.leaves(diffs)
    return max(leaves) if leaves else 0.0


def shard_divergence(x: jax.Array) -> float:
    """Max abs difference between the per-device shards of an array that
    should be fully replicated (the is_all_equal use case)."""
    shards = [np.asarray(s.data) for s in x.addressable_shards]
    if len(shards) < 2:
        return 0.0
    base = shards[0]
    return max(float(np.max(np.abs(s - base))) for s in shards[1:])


def assert_replicated(tree: Any, atol: float = 0.0) -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "addressable_shards"):
            d = shard_divergence(leaf)
            assert d <= atol, f"{jax.tree_util.keystr(path)} diverges: {d}"
