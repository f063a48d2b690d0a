"""AOT-compile the sharded multi-chip programs against a REAL TPU topology.

The multichip dryrun (__graft_entry__.dryrun_multichip) executes on a
virtual CPU mesh, and CPU interpret mode provably hides Mosaic lowering
bugs (DESIGN.md item 25: a kernel that interpreted fine but failed Mosaic
layout checks on the chip). This script closes that gap WITHOUT needing 8
physical chips: it lowers + compiles the production sharded programs
against a ``v5e:2x4`` topology descriptor (8 devices) using the real TPU
compiler, so any Mosaic kernel lowering, layout, or SPMD partitioning
regression fails HERE, at per-shard shapes.

Legs (full-width Phi-3 geometry — hidden 3072 / 32 heads / 220-token
frames, LVM/processor.py:122,427 — with a short layer stack so compile
stays fast; Mosaic lowering is per-layer so depth adds no coverage):

  train_dp_sp_tp — (2,2,2) dp x sp x tp ZeRO-3 train step (Ulysses
                   shard_map + TP-grouped fused kernels + Pallas flash
                   attention fwd/bwd)
  decode_tp2/tp4 — cached serving decode (prefill -> decode) under a TP
                   mesh, KV cache head-sharded at rest

Usage: ``python scripts/aot_check.py`` from the repo root (the TPU plugin
breaks when scripts run from elsewhere — see .claude/skills/verify).
Prints one JSON line; exit 1 on any compile failure.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_gpt_tpu.config import ModelConfig, TrainConfig
from video_gpt_tpu.layout import (RowSpec, build_layout,
                                  frame_block_inference_layout,
                                  tokens_per_frame)
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT
from video_gpt_tpu.parallel.mesh import (DATA_AXIS, PIPE_AXIS, SEQ_AXIS,
                                         TENSOR_AXIS, param_specs)
from video_gpt_tpu.training.loss import LossInputs
from video_gpt_tpu.training.train_state import (init_train_state,
                                                make_train_step)

# full-width model, short stack: per-shard kernel shapes match production
# (head_dim 96, 16 heads / TP-2 shard, 220-token frames); depth only
# repeats the same Mosaic kernels
_WIDE = dict(hidden_size=3072, num_layers=2, num_heads=32, num_kv_heads=32,
             intermediate_size=8192)
H, W = 176, 320                      # inference_nv.sh geometry


def _topology_mesh(shape, axes, name="v5e:2x4"):
    from jax.experimental import topologies
    topo = topologies.get_topology_desc(platform="tpu", topology_name=name)
    n = int(np.prod(shape))
    return Mesh(np.array(topo.devices[:n]).reshape(shape), axes)


def _sds(tree, spec_tree):
    """ShapeDtypeStruct tree carrying the given NamedShardings."""
    return jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        tree, spec_tree)


def _repl_sds(tree, mesh, batch_shape=None):
    """Replicated SDS tree; [B, L] leaves optionally (data, seq)-sharded."""
    def one(x):
        x = jnp.asarray(x) if not hasattr(x, "dtype") else x
        spec = P()
        if batch_shape is not None and getattr(x, "ndim", 0) == 2 \
                and tuple(x.shape) == batch_shape:
            spec = P(DATA_AXIS, SEQ_AXIS)
        return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                    sharding=NamedSharding(mesh, spec))
    return jax.tree.map(one, tree)


def aot_train_leg(data=2, seq=2, tensor=2, topology="v5e:2x4"):
    """dp x sp x tp ZeRO-3 train step, AOT against a TPU topology.

    The default is the single-host v5e:2x4; ``aot_train_multihost`` runs
    the same program against v5e:4x4 — 16 chips over FOUR hosts — so the
    compile also exercises the multi-host partitioning/collective paths
    the reference demonstrates with torchrun x8 (pretrain_stage1_nv.sh)."""
    mesh = _topology_mesh((data, seq, tensor, 1),
                          (DATA_AXIS, SEQ_AXIS, TENSOR_AXIS, PIPE_AXIS),
                          name=topology)
    cfg = ModelConfig(attn_impl="auto", seq_shard=True,
                      sp_attention="ulysses", tensor_parallel=tensor,
                      remat=True, **_WIDE)
    n = tokens_per_frame(H, W)
    layout = build_layout([RowSpec((1, 2, 1), "training")
                           for _ in range(data)], n, pad_to_multiple=seq)
    batch = Batch.from_layout(layout)
    hl, wl = H // 8, W // 8
    nn_, nc = layout.num_noisy_frames, layout.num_clean_frames
    dt = jnp.bfloat16
    model = VideoGPT(cfg, dtype=dt, train_init=True)
    z = jax.ShapeDtypeStruct((nn_, hl, wl, cfg.in_channels), dt)
    cl = jax.ShapeDtypeStruct((nc, hl, wl, cfg.in_channels), dt)
    t0 = jax.ShapeDtypeStruct((nn_,), dt)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch, z,
                            t0, cl)
    tcfg = TrainConfig(use_ema=True, lr_warmup_steps=2,
                       mixed_precision="bf16")
    state = jax.eval_shape(lambda p: init_train_state(model, p, tcfg),
                           params)
    max_blocks = int(layout.noisy_frame_block.max()) + 1
    step = make_train_step(model, tcfg, max_blocks)

    with jax.sharding.set_mesh(mesh):
        state_sh = state._replace(
            step=NamedSharding(mesh, P()),
            params=param_specs(state.params, mesh, tp=True, zero=True),
            opt_state=param_specs(state.opt_state, mesh, tp=True,
                                  zero=True),
            ema_params=param_specs(state.ema_params, mesh, tp=True,
                                   zero=True))
        state_sds = _sds(state, state_sh)
        inputs = LossInputs(
            batch=batch,
            x1=jax.ShapeDtypeStruct((nn_, hl, wl, cfg.in_channels),
                                    jnp.float32),
            clean_latents=jax.ShapeDtypeStruct(
                (nc, hl, wl, cfg.in_channels), jnp.float32),
            noisy_frame_row=jnp.asarray(layout.noisy_frame_row),
            noisy_frame_block=jnp.asarray(layout.noisy_frame_block))
        inputs_sds = _repl_sds(inputs, mesh,
                               batch_shape=(layout.batch, layout.length))
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                   sharding=NamedSharding(mesh, P()))
        compiled = jax.jit(step, donate_argnums=(0,)).lower(
            state_sds, rng, inputs_sds).compile()
    mem = compiled.memory_analysis()
    return {"leg": f"train_dp_sp_tp@{topology}",
            "mesh": [data, seq, tensor],
            "flops_per_step": compiled.cost_analysis().get("flops"),
            "temp_bytes_per_device": getattr(mem, "temp_size_in_bytes",
                                             None)}


def aot_pp_train_leg(data=4, pipe=2, num_micro=2, topology="v5e:2x4"):
    """dp x pp GPipe train step AOT against a TPU topology: the ppermute
    pipeline ring (parallel/pipeline.py) compiled by the real TPU compiler
    — the dryrun covers it only on the CPU-interpret mesh."""
    import functools

    from video_gpt_tpu.parallel.pipeline import pp_apply

    mesh = _topology_mesh((data, 1, 1, pipe),
                          (DATA_AXIS, SEQ_AXIS, TENSOR_AXIS, PIPE_AXIS),
                          name=topology)
    cfg = ModelConfig(attn_impl="auto", remat=True, **_WIDE)
    n = tokens_per_frame(H, W)
    rows = data * num_micro  # whole microbatches per data shard
    layout = build_layout([RowSpec((1, 2, 1), "training")
                           for _ in range(rows)], n)
    batch = Batch.from_layout(layout)
    hl, wl = H // 8, W // 8
    nn_, nc = layout.num_noisy_frames, layout.num_clean_frames
    dt = jnp.bfloat16
    model = VideoGPT(cfg, dtype=dt, train_init=True)
    z = jax.ShapeDtypeStruct((nn_, hl, wl, cfg.in_channels), dt)
    cl = jax.ShapeDtypeStruct((nc, hl, wl, cfg.in_channels), dt)
    t0 = jax.ShapeDtypeStruct((nn_,), dt)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch, z,
                            t0, cl)
    tcfg = TrainConfig(lr_warmup_steps=2, mixed_precision="bf16")
    state = jax.eval_shape(lambda p: init_train_state(model, p, tcfg),
                           params)
    max_blocks = int(layout.noisy_frame_block.max()) + 1
    step = make_train_step(
        model, tcfg, max_blocks,
        apply_fn=functools.partial(pp_apply, model, num_micro=num_micro))

    with jax.sharding.set_mesh(mesh):
        state_sh = state._replace(
            step=NamedSharding(mesh, P()),
            params=param_specs(state.params, mesh, pp=True),
            opt_state=param_specs(state.opt_state, mesh, pp=True,
                                  zero=True),
            ema_params=None)
        state_sds = _sds(state, state_sh)
        inputs = LossInputs(
            batch=batch,
            x1=jax.ShapeDtypeStruct((nn_, hl, wl, cfg.in_channels),
                                    jnp.float32),
            clean_latents=jax.ShapeDtypeStruct(
                (nc, hl, wl, cfg.in_channels), jnp.float32),
            noisy_frame_row=jnp.asarray(layout.noisy_frame_row),
            noisy_frame_block=jnp.asarray(layout.noisy_frame_block))
        inputs_sds = _repl_sds(inputs, mesh,
                               batch_shape=(layout.batch, layout.length))
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                   sharding=NamedSharding(mesh, P()))
        compiled = jax.jit(step, donate_argnums=(0,)).lower(
            state_sds, rng, inputs_sds).compile()
    return {"leg": f"train_dp_pp@{topology}", "mesh": [data, pipe],
            "flops_per_step": compiled.cost_analysis().get("flops")}


def aot_decode_leg(tp: int):
    """TP cached serving decode (prefill -> decode), AOT against v5e:2x4."""
    mesh = _topology_mesh((1, 1, tp, 1),
                          (DATA_AXIS, SEQ_AXIS, TENSOR_AXIS, PIPE_AXIS))
    cfg = ModelConfig(attn_impl="auto", tensor_parallel=tp, **_WIDE)
    n = tokens_per_frame(H, W)
    lay = frame_block_inference_layout(2, 1, n, use_cfg=True)
    prefix = lay.length - lay.noisy_tail_len()
    tail = lay.noisy_tail_len()
    batch = Batch.from_layout(lay)
    hl, wl = H // 8, W // 8
    dt = jnp.bfloat16
    model = VideoGPT(cfg, dtype=dt)
    nn_ = 2  # CFG pair
    z = jax.ShapeDtypeStruct((nn_, hl, wl, cfg.in_channels), dt)
    t0 = jax.ShapeDtypeStruct((nn_,), dt)
    cl = jax.ShapeDtypeStruct((2, hl, wl, cfg.in_channels), dt)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch, z,
                            t0, cl)

    def f(p, z, t, cl):
        cache = model.apply(p, batch, cl, prefix, method=VideoGPT.prefill)
        return model.apply(p, batch, z, t, cache, tail,
                           method=VideoGPT.decode)

    with jax.sharding.set_mesh(mesh):
        p_sds = _sds(params, param_specs(params, mesh, tp=True))
        repl = NamedSharding(mesh, P())
        args = [jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl)
                for s in (z, t0, cl)]
        compiled = jax.jit(f).lower(p_sds, *args).compile()
    return {"leg": f"decode_tp{tp}", "mesh": [1, 1, tp],
            "flops": compiled.cost_analysis().get("flops")}


def main():
    t0 = time.time()
    legs, ok = [], True
    for name, fn in (
            ("train_dp_sp_tp", aot_train_leg),
            ("decode_tp2", lambda: aot_decode_leg(2)),
            ("decode_tp4", lambda: aot_decode_leg(4)),
            # 16 chips over FOUR hosts: multi-host partitioning compiles
            ("train_multihost_v5e16",
             lambda: aot_train_leg(4, 2, 2, topology="v5e:4x4")),
            # GPipe ppermute ring through the real TPU compiler
            ("train_dp_pp", aot_pp_train_leg)):
        try:
            legs.append(fn())
        except Exception as e:  # noqa: BLE001 — report and fail the run
            ok = False
            legs.append({"leg": name,
                         "error": f"{type(e).__name__}: {e}"[:500]})
    print(json.dumps({"aot_topology": "v5e:2x4", "ok": ok, "legs": legs,
                      "elapsed_s": round(time.time() - t0, 1)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
