"""GPipe pipeline parallelism over the mesh's ``pipe`` axis.

TPU-native pipeline parallelism the reference does not implement (its
parallelism is DeepSpeed ZeRO + Ulysses SP, LVM/acceleration/*): the
nn.scan layer stack's leading (layer) axis is sharded into ``pp``
contiguous stages, and microbatches flow stage-to-stage over
``jax.lax.ppermute`` inside one ``shard_map`` — the standard JAX pipelining
pattern (jax-ml.github.io/scaling-book "pipelining"): every stage computes
every tick; the first ``pp-1`` ticks of later stages and the last ``pp-1``
ticks of earlier stages are the GPipe bubble.

Design notes:
- Only ACTIVATIONS travel the ring. Per-microbatch metadata (attention
  meta, rope tables) is replicated on every stage and indexed locally by
  ``tick - stage``, so the ppermute payload is exactly [mb, L, D].
- The whole loop is differentiable (``ppermute`` transposes to the reverse
  permutation); gradient checkpointing applies per layer inside each
  stage, mirroring the nn.remat policy of the non-PP path.
- Outputs materialise on the LAST stage and are ``psum``-broadcast over
  'pipe' (every other stage contributes zeros), so the caller sees a
  replicated [B, L, D] — the same contract as the plain trunk.
- Composes with data parallelism (batch rows over 'data'); PP x TP and
  PP x SP are rejected loudly — attention inside a stage is local
  full-sequence math, and nesting manual collectives inside the stage
  body is a different design (use tp/sp WITHOUT pp for those regimes).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .mesh import DATA_AXIS, PIPE_AXIS, axis_size


def _micro(tree, nm: int, batch: int):
    """Split the leading batch dim of every [B, ...] leaf into
    [nm, B/nm, ...] microbatches."""
    def split(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == batch:
            return x.reshape(nm, batch // nm, *x.shape[1:])
        return x
    return jax.tree.map(split, tree)


def _index(tree, m):
    return jax.tree.map(
        lambda x: jax.lax.dynamic_index_in_dim(x, m, 0, keepdims=False),
        tree)


def pipeline_trunk(cfg, dtype, layer_params, x, cos, sin, q_meta, k_meta,
                   num_micro: Optional[int] = None):
    """Run the Phi3 layer stack [B, L, D] -> [B, L, D] as a GPipe pipeline
    over the ambient mesh's 'pipe' axis (plain layer scan when pp == 1).

    ``layer_params`` is the nn.scan-stacked tree (params['llm']['layers'],
    leading dim num_layers, sharded P('pipe', ...) at rest by
    mesh.param_specs). The final RMSNorm and the embedding/head ends stay
    OUTSIDE (see training.pp_apply) — the classic GPipe split. The
    attention mask comes from O(L) metadata (no dense-bias operand: it
    would replicate [Lq, Lk] onto every stage)."""
    from ..models.phi3 import Phi3Layer

    pp = axis_size(PIPE_AXIS)
    layer = Phi3Layer(cfg, dtype)

    def stage_scan(lp, xm, cos_m, sin_m, qm, km):
        """One stage: scan xm through this stage's layer block."""
        def body(carry, one_layer):
            y, _ = layer.apply({"params": one_layer}, carry, None,
                               cos_m, sin_m, qm, km, None)
            return y, None
        if cfg.remat:
            body = jax.checkpoint(
                body, prevent_cse=False,
                policy=jax.checkpoint_policies.nothing_saveable)
        y, _ = jax.lax.scan(body, xm, lp)
        return y

    if pp == 1:
        return stage_scan(layer_params, x, cos, sin, q_meta, k_meta)

    if cfg.tensor_parallel > 1 or cfg.sp_attention != "none" \
            or cfg.seq_shard:
        raise ValueError(
            "pipeline parallelism runs the stage body as local math; "
            "combine pp with data parallelism, not tp/sp "
            f"(got tensor_parallel={cfg.tensor_parallel}, "
            f"sp_attention={cfg.sp_attention!r}, seq_shard={cfg.seq_shard})")
    if cfg.num_layers % pp:
        raise ValueError(f"num_layers={cfg.num_layers} not divisible by "
                         f"pipe axis {pp}")
    b, l, d = x.shape
    nm = num_micro or pp
    dp = axis_size(DATA_AXIS)
    if b % (nm * dp):
        raise ValueError(f"batch {b} not divisible by "
                         f"num_micro*data = {nm}*{dp}")

    mesh = jax.sharding.get_abstract_mesh()
    micro = _micro((x, cos, sin), nm, b)
    meta = _micro((q_meta, k_meta), nm, b)

    def inner(lp, micro, meta):
        x_m, cos_m, sin_m = micro
        stage = jax.lax.axis_index(PIPE_AXIS)
        ticks = nm + pp - 1

        def tick(state, t):
            m = jnp.clip(t - stage, 0, nm - 1)
            inp = jnp.where(stage == 0, _index(x_m, m), state)
            qm, km = _index(meta, m)
            y = stage_scan(lp, inp, _index(cos_m, m), _index(sin_m, m),
                           qm, km)
            nxt = jax.lax.ppermute(
                y, PIPE_AXIS, [(i, (i + 1) % pp) for i in range(pp)])
            return nxt, y

        init = jnp.zeros_like(_index(x_m, 0))
        _, ys = jax.lax.scan(tick, init, jnp.arange(ticks))
        # microbatch m finishes on the last stage at tick m + (pp-1)
        outs = jax.lax.dynamic_slice_in_dim(ys, pp - 1, nm, 0)
        outs = jnp.where(stage == pp - 1, outs, 0.0)
        return jax.lax.psum(outs, PIPE_AXIS)

    from jax.sharding import PartitionSpec as P
    lp_specs = jax.tree.map(
        lambda leaf: P(PIPE_AXIS, *([None] * (leaf.ndim - 1))),
        layer_params)
    micro_specs = jax.tree.map(
        lambda leaf: P(None, DATA_AXIS, *([None] * (leaf.ndim - 2))), micro)
    meta_specs = jax.tree.map(lambda leaf: P(None, DATA_AXIS, None), meta)
    out = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(lp_specs, micro_specs, meta_specs),
        out_specs=P(None, DATA_AXIS, None, None),
        check_vma=False,
    )(layer_params, micro, meta)
    return out.reshape(b, l, d)


def pp_apply(model, params, batch, noisy_latents, t, clean_latents=None,
             input_output_return: bool = False,
             num_micro: Optional[int] = None):
    """VideoGPT full-sequence forward with the trunk pipelined over 'pipe'.

    Drop-in for ``model.apply(params, batch, xt, t, clean)`` (the
    training_loss ``apply_fn`` contract): embedding assembly and the
    per-frame heads run outside the pipeline (replicated — they are a tiny
    fraction of the FLOPs), the layer stack runs as the GPipe loop. With
    pp == 1 this is numerically the plain forward (tested)."""
    from ..models.phi3 import RMSNorm, rope_tables
    from ..models.video_gpt import VideoGPT

    cfg = model.cfg
    emb = model.apply(params, batch.input_ids, batch.noisy_src,
                      batch.clean_src, batch.time_src, noisy_latents, t,
                      clean_latents, method=VideoGPT._assemble)
    cos, sin = rope_tables(batch.pos_ids, cfg.head_dim, cfg.rope_theta,
                           model.dtype)
    inner = params["params"] if "params" in params else params
    hidden = pipeline_trunk(cfg, model.dtype, inner["llm"]["layers"], emb,
                            cos, sin, batch.meta, batch.meta,
                            num_micro=num_micro)
    hidden = RMSNorm(cfg.rms_norm_eps, model.dtype).apply(
        {"params": inner["llm"]["norm"]}, hidden)
    nn_, hl, wl, _ = noisy_latents.shape
    pred = model.apply(params, hidden, batch.noisy_gather, t,
                       (nn_, hl, wl), method=VideoGPT._heads)
    if input_output_return:
        nc = clean_latents.shape[0]
        aux = model.apply(params, hidden, batch.clean_gather, None,
                          (nc, clean_latents.shape[1],
                           clean_latents.shape[2]), True,
                          method=VideoGPT._heads)
        return pred, aux
    return pred
