"""LoRA fine-tuning as parameter trees.

Replaces the reference's peft wrapper (train_x1_stage1:204-223: rank-8
adapters on ``qkv_proj``/``o_proj``) with plain pytrees: adapters live in
their own tree, the merged kernel ``W + (alpha/r)·A@B`` is formed inside the
jitted step, and only the adapter leaves receive gradients/optimizer state.
Works on the stacked [num_layers, in, out] kernels of the scanned decoder.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("qkv_proj", "o_proj")


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def init_lora(params: Dict, rank: int, rng: jax.Array,
              targets: Sequence[str] = DEFAULT_TARGETS) -> Dict:
    """Adapter tree mirroring the structure of targeted kernels.

    A ~ N(0, 1/sqrt(fan_in)) (peft's kaiming-style init), B = 0 so the
    merged model starts exactly at the base weights."""
    lora = {}
    for path, leaf in _walk(params):
        if len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets:
            rng, r = jax.random.split(rng)
            *lead, fan_in, fan_out = leaf.shape
            a = jax.random.normal(r, (*lead, fan_in, rank),
                                  jnp.float32) / (fan_in ** 0.5)
            b = jnp.zeros((*lead, rank, fan_out), jnp.float32)
            node = lora
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node["lora_a"] = a
            node["lora_b"] = b
    return lora


def apply_lora(params: Dict, lora: Dict, alpha: float = 8.0) -> Dict:
    """Merged params: kernel + (alpha/r)*A@B (peft scaling convention)."""

    def merge(p_node, l_node):
        if not isinstance(p_node, dict):
            return p_node
        out = {}
        for k, v in p_node.items():
            child_l = l_node.get(k, {}) if isinstance(l_node, dict) else {}
            if k == "kernel" and isinstance(l_node, dict) \
                    and "lora_a" in l_node:
                a, b = l_node["lora_a"], l_node["lora_b"]
                rank = a.shape[-1]
                delta = jnp.einsum("...ir,...ro->...io", a, b) * (
                    alpha / rank)
                out[k] = (v + delta.astype(v.dtype))
            else:
                out[k] = merge(v, child_l)
        return out

    return merge(params, lora)


def merge_lora(params: Dict, lora: Dict, alpha: float = 8.0) -> Dict:
    """Materialise merged weights (LVMPipeline.merge_lora,
    LVM/pipeline.py:97-101)."""
    return jax.tree.map(jnp.asarray, apply_lora(params, lora, alpha))


def graft_lora(params: Dict, lora: Dict) -> Dict:
    """Insert the adapter leaves into a base params tree WITHOUT merging —
    the tree a ``lora_rank > 0`` model consumes (phi3.LoraDense). Training
    differentiates only the adapter argument, so the frozen base never
    grows kernel cotangents. Existing lora leaves in ``params`` (e.g. from
    ``model.init`` of a rank>0 model) are replaced."""

    def weave(p_node, l_node):
        if not isinstance(p_node, dict):
            return p_node
        out = {}
        for k, v in p_node.items():
            child_l = l_node.get(k, {}) if isinstance(l_node, dict) else {}
            out[k] = weave(v, child_l)
        if isinstance(l_node, dict):
            for k in ("lora_a", "lora_b"):
                if k in l_node:
                    out[k] = l_node[k]
        return out

    return weave(params, lora)
