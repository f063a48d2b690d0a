"""Import reference checkpoints (torch state_dicts) into flax param trees.

Covers the reference's export formats — model.safetensors / model.pt /
sharded pytorch_model.bin (LVM/model.py:196-211, inference driver:49-68) —
so parity against reference weights is testable. Input is a flat mapping
name -> numpy array (convert torch tensors with ``.numpy()`` first; no torch
dependency here).

Name scheme (reference LVM/model.py):
  x_embedder.proj.{weight,bias}          Conv2d k=p s=p  -> Dense over patches
  input_x_embedder.proj.{weight,bias}
  time_token.mlp.{0,2}.{weight,bias}     -> fc1/fc2
  t_embedder.mlp.{0,2}.{weight,bias}
  final_layer.adaLN_modulation.1.*       -> adaLN_modulation
  final_layer.linear.*
  input_final_layer.*
  llm.embed_tokens.weight
  llm.layers.{i}.self_attn.{qkv_proj,o_proj}.weight
  llm.layers.{i}.mlp.{gate_up_proj,down_proj}.weight
  llm.layers.{i}.{input_layernorm,post_attention_layernorm}.weight
  llm.norm.weight
  pos_embed                              (buffer; recomputed — ignored)
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..config import ModelConfig


def _dense(w: np.ndarray, b: np.ndarray | None = None) -> Dict:
    out = {"kernel": np.ascontiguousarray(w.T)}
    if b is not None:
        out["bias"] = np.ascontiguousarray(b)
    return out


def _conv_as_dense(w: np.ndarray, b: np.ndarray) -> Dict:
    # torch Conv2d weight [D, C, p, p] -> Dense kernel [(p, p, C) flat, D],
    # matching embedders.patchify's (ph, pw, c) minor order.
    d = w.shape[0]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, d)
    return {"kernel": np.ascontiguousarray(kernel), "bias": b}


def decoder_params_from_torch(sd: Mapping[str, np.ndarray], cfg: ModelConfig,
                              prefix: str = "llm.") -> Dict:
    """Phi-3 trunk params (stacked over layers for the nn.scan body)."""
    nl = cfg.num_layers

    def stack(fmt: str) -> np.ndarray:
        return np.stack([sd[prefix + fmt.format(i)] for i in range(nl)])

    layers = {
        "self_attn": {
            "qkv_proj": {"kernel": stack(
                "layers.{}.self_attn.qkv_proj.weight").transpose(0, 2, 1)},
            "o_proj": {"kernel": stack(
                "layers.{}.self_attn.o_proj.weight").transpose(0, 2, 1)},
        },
        "mlp": {
            "gate_up_proj": {"kernel": stack(
                "layers.{}.mlp.gate_up_proj.weight").transpose(0, 2, 1)},
            "down_proj": {"kernel": stack(
                "layers.{}.mlp.down_proj.weight").transpose(0, 2, 1)},
        },
        "input_layernorm": {"weight": stack("layers.{}.input_layernorm.weight")},
        "post_attention_layernorm": {
            "weight": stack("layers.{}.post_attention_layernorm.weight")},
    }
    return {"layers": layers, "norm": {"weight": sd[prefix + "norm.weight"]}}


def videogpt_params_from_torch(sd: Mapping[str, np.ndarray],
                               cfg: ModelConfig,
                               input_head: bool = False) -> Dict:
    """Full VideoGPT param tree from a reference state_dict."""
    params = {
        "embed_tokens": {"embedding": sd["llm.embed_tokens.weight"]},
        "x_embedder": {"proj": _conv_as_dense(
            sd["x_embedder.proj.weight"], sd["x_embedder.proj.bias"])},
        "input_x_embedder": {"proj": _conv_as_dense(
            sd["input_x_embedder.proj.weight"],
            sd["input_x_embedder.proj.bias"])},
        "time_token": {
            "fc1": _dense(sd["time_token.mlp.0.weight"],
                          sd["time_token.mlp.0.bias"]),
            "fc2": _dense(sd["time_token.mlp.2.weight"],
                          sd["time_token.mlp.2.bias"]),
        },
        "t_embedder": {
            "fc1": _dense(sd["t_embedder.mlp.0.weight"],
                          sd["t_embedder.mlp.0.bias"]),
            "fc2": _dense(sd["t_embedder.mlp.2.weight"],
                          sd["t_embedder.mlp.2.bias"]),
        },
        "final_layer": {
            "adaLN_modulation": _dense(
                sd["final_layer.adaLN_modulation.1.weight"],
                sd["final_layer.adaLN_modulation.1.bias"]),
            "linear": _dense(sd["final_layer.linear.weight"],
                             sd["final_layer.linear.bias"]),
        },
        "llm": decoder_params_from_torch(sd, cfg),
    }
    if input_head:
        params["input_final_layer"] = _dense(
            sd["input_final_layer.weight"], sd["input_final_layer.bias"])
    return params


def resolve_checkpoint_path(path: str) -> str:
    """Resolve a checkpoint dir to the concrete artifact the reference
    driver would load, in ITS precedence order: model.pt, then
    model.safetensors, then pytorch_model.bin — where the last may be a
    FILE or a DIRECTORY of ``*.bin`` shards (LVM inference driver:49-66).
    A file path is returned as-is; the shard case returns the shard dir."""
    import os

    if not os.path.isdir(path):
        return path
    for name in ("model.pt", "model.safetensors", "pytorch_model.bin"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"no model.pt / model.safetensors / pytorch_model.bin under {path}")


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read model.safetensors / model.pt / pytorch_model.bin (file or shard
    directory) into a flat numpy dict (format fallbacks and precedence per
    the LVM inference driver:49-66)."""
    import os

    path = resolve_checkpoint_path(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    if os.path.isdir(path):  # pytorch_model.bin shard directory
        sd: Dict = {}
        for name in sorted(os.listdir(path)):
            if name.endswith(".bin"):
                sd.update(torch.load(os.path.join(path, name),
                                     map_location="cpu", weights_only=True))
        if not sd:
            raise FileNotFoundError(f"no *.bin shards under {path}")
    else:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}
