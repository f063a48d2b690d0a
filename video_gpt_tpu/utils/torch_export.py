"""Export flax params to the reference's torch/safetensors layout.

Inverse of utils/torch_import.py — lets a checkpoint trained here be loaded
by the reference implementation (LVM/model.py:196-211) for cross-framework
parity runs. Pure numpy; writes safetensors via safetensors.numpy.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..config import ModelConfig


def _np(x) -> np.ndarray:
    # contiguous is load-bearing: safetensors serialises the raw buffer, and
    # transpose VIEWS get written in buffer order (silently wrong data)
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def videogpt_params_to_torch(params: Mapping, cfg: ModelConfig
                             ) -> Dict[str, np.ndarray]:
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    def dense(dst, node):
        sd[dst + ".weight"] = _np(np.asarray(node["kernel"]).T)
        if "bias" in node:
            sd[dst + ".bias"] = _np(node["bias"])

    def conv_from_dense(dst, node, patch, in_ch):
        k = _np(node["kernel"])  # [(p, p, C), D]
        d = k.shape[-1]
        sd[dst + ".weight"] = np.ascontiguousarray(
            k.reshape(patch, patch, in_ch, d).transpose(3, 2, 0, 1))
        sd[dst + ".bias"] = _np(node["bias"])

    conv_from_dense("x_embedder.proj", p["x_embedder"]["proj"],
                    cfg.patch_size, cfg.in_channels)
    conv_from_dense("input_x_embedder.proj", p["input_x_embedder"]["proj"],
                    cfg.patch_size, cfg.in_channels)
    dense("time_token.mlp.0", p["time_token"]["fc1"])
    dense("time_token.mlp.2", p["time_token"]["fc2"])
    dense("t_embedder.mlp.0", p["t_embedder"]["fc1"])
    dense("t_embedder.mlp.2", p["t_embedder"]["fc2"])
    dense("final_layer.adaLN_modulation.1",
          p["final_layer"]["adaLN_modulation"])
    dense("final_layer.linear", p["final_layer"]["linear"])
    if "input_final_layer" in p:
        dense("input_final_layer", p["input_final_layer"])

    sd["llm.embed_tokens.weight"] = _np(p["embed_tokens"]["embedding"])
    layers = p["llm"]["layers"]
    for i in range(cfg.num_layers):
        base = f"llm.layers.{i}."
        sd[base + "self_attn.qkv_proj.weight"] = _np(
            np.asarray(layers["self_attn"]["qkv_proj"]["kernel"][i]).T)
        sd[base + "self_attn.o_proj.weight"] = _np(
            np.asarray(layers["self_attn"]["o_proj"]["kernel"][i]).T)
        sd[base + "mlp.gate_up_proj.weight"] = _np(
            np.asarray(layers["mlp"]["gate_up_proj"]["kernel"][i]).T)
        sd[base + "mlp.down_proj.weight"] = _np(
            np.asarray(layers["mlp"]["down_proj"]["kernel"][i]).T)
        sd[base + "input_layernorm.weight"] = _np(
            layers["input_layernorm"]["weight"][i])
        sd[base + "post_attention_layernorm.weight"] = _np(
            layers["post_attention_layernorm"]["weight"][i])
    sd["llm.norm.weight"] = _np(p["llm"]["norm"]["weight"])
    return sd


def save_safetensors(params: Mapping, cfg: ModelConfig, path: str) -> None:
    from safetensors.numpy import save_file
    save_file(videogpt_params_to_torch(params, cfg), path)
