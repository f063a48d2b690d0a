"""Break down the flagship decode step on the real chip (separate-CFG era).

Measures (median of REPS after compile):
  prefill_b1        clean-prefix prefill, conditional row only
  cond_step         cached decode of the conditional row (rank kernel)
  uncond_step       tail-only full forward (uncond CFG context)
  attn_rank_x32     flash_mha_decode kernel alone, 32 layer-equivalents
  attn_bias_x32     old bias-mode kernel at the same shapes
  matmul_floor_b1   qkv/o/gate_up/down matmuls for one 3552-token row x32
Env: UNROLL=<n> sets ModelConfig.scan_unroll.
"""
import functools
import os
import time

import jax
import jax.numpy as jnp

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from video_gpt_tpu.config import ModelConfig
from video_gpt_tpu.layout import frame_block_inference_layout, tokens_per_frame
from video_gpt_tpu.models.video_gpt import Batch, VideoGPT, decode_mask
from video_gpt_tpu.ops.flash_attention import (flash_mha_biased,
                                               flash_mha_decode,
                                               precompute_bias)

N_CLEAN, N_GEN, H, W = 8, 16, 176, 320
REPS = 10
UNROLL = int(os.environ.get("UNROLL", "1"))


def timed(fn, *args):
    from video_gpt_tpu.utils.profiling import force_ready
    out = fn(*args)
    force_ready(out)  # block_until_ready no-ops while remote-compiling
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    cfg = ModelConfig(scan_unroll=UNROLL)
    model = VideoGPT(cfg, dtype=jnp.bfloat16)
    n = tokens_per_frame(H, W)
    lay_c = frame_block_inference_layout(N_CLEAN, N_GEN, n, use_cfg=False)
    lay_u = frame_block_inference_layout(0, N_GEN, n, use_cfg=False)
    batch_c, batch_u = Batch.from_layout(lay_c), Batch.from_layout(lay_u)
    tail = lay_c.noisy_tail_len()
    prefix = lay_c.length - tail
    hl, wl = H // 8, W // 8
    z = jax.random.normal(jax.random.PRNGKey(0), (N_GEN, hl, wl, 4),
                          jnp.bfloat16)
    clean = jax.random.normal(jax.random.PRNGKey(1), (N_CLEAN, hl, wl, 4),
                              jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(2), batch_c, z, jnp.zeros((N_GEN,), jnp.bfloat16),
        clean))
    params = jax.tree.map(lambda s: jnp.zeros(
        s.shape, jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating)
        else s.dtype), shapes)
    t_vec = jnp.full((N_GEN,), 0.5, jnp.bfloat16)

    prefill = jax.jit(lambda p, c: model.apply(
        p, batch_c, c, prefix, method=VideoGPT.prefill))
    cache = prefill(params, clean)
    print("prefill_b1_s", timed(prefill, params, clean))

    dm_c = decode_mask(batch_c.meta.tail(tail), batch_c.meta)
    dm_u = decode_mask(batch_u.meta, batch_u.meta)

    cond = jax.jit(lambda p, z, t, cache: model.apply(
        p, batch_c, z, t, cache, tail, dm_c, method=VideoGPT.decode))
    print("cond_step_s", timed(cond, params, z, t_vec, cache))

    uncond = jax.jit(lambda p, z, t: model.apply(
        p, batch_u, z, t, bias=dm_u))
    print("uncond_step_s", timed(uncond, params, z, t_vec))

    # attention kernels alone at cond decode shapes
    b, lq, lk = 1, tail, lay_c.length
    hdim, heads = cfg.head_dim, cfg.num_heads
    q = jax.random.normal(jax.random.PRNGKey(3), (b, lq, heads, hdim),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(4), (b, lk, heads, hdim),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(5), (b, lk, heads, hdim),
                          jnp.bfloat16)

    def x32(inner):
        @jax.jit
        def fn(*args):
            def body(acc, _):
                return acc + inner(*args).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.zeros_like(q, jnp.float32),
                                  jnp.arange(32))
            return out
        return fn

    print("attn_rank_x32_s",
          timed(x32(lambda q, k, v: flash_mha_decode(q, k, v, dm_c)), q, k, v))
    bias = jax.jit(lambda: precompute_bias(batch_c.meta.tail(tail),
                                           batch_c.meta))()
    print("attn_bias_x32_s",
          timed(x32(lambda q, k, v: flash_mha_biased(q, k, v, bias)),
                q, k, v))

    x = jax.random.normal(jax.random.PRNGKey(6), (b, lq, cfg.hidden_size),
                          jnp.bfloat16)
    wq = jnp.zeros((cfg.hidden_size, 3 * cfg.hidden_size), jnp.bfloat16)
    wo = jnp.zeros((cfg.hidden_size, cfg.hidden_size), jnp.bfloat16)
    wg = jnp.zeros((cfg.hidden_size, 2 * cfg.intermediate_size), jnp.bfloat16)
    wd = jnp.zeros((cfg.intermediate_size, cfg.hidden_size), jnp.bfloat16)

    @jax.jit
    def matmuls32(x, wq, wo, wg, wd):
        def body(x, _):
            a = x @ wq
            x = x + a[..., :cfg.hidden_size] @ wo
            g = x @ wg
            gate, up = jnp.split(g, 2, axis=-1)
            x = x + (jax.nn.silu(gate) * up) @ wd
            return x, None
        out, _ = jax.lax.scan(body, x, jnp.arange(32))
        return out
    print("matmul_floor_b1_s", timed(matmuls32, x, wq, wo, wg, wd))


if __name__ == "__main__":
    main()
