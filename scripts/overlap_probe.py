"""Does Mosaic co-schedule independent MXU and VPU chains inside one kernel?

The decode kernels serialize three phases per q-block: QK^T (MXU), masked
exp2 softmax (VPU/EUP), PV (MXU). If Mosaic's VLIW scheduler overlaps
INDEPENDENT chains, splitting the key row into subtiles and interleaving
chain j's exp2 with chain j+1's dot should hide VPU time under the MXU —
the classic software pipeline. This probe measures exactly that, isolated
from the real kernels:

  A) serial:     one [bq, lk] dot, one exp2 pass, one PV dot (today's body)
  B) pipelined:  n subtiles, dots issued one subtile ahead of the exp2 pass

Equal math, equal FLOPs, equal bytes. If B beats A by ~min(MXU, VPU) time,
pipelining the production kernels is worth the surgery; if B == A, Mosaic
already overlaps (or never overlaps) and the surgery is dead.

Run ON the chip from /root/repo:  python scripts/overlap_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

# BQ=256: the serial variant holds the full [BQ, LK] f32 score matrix in
# vmem (8M at 256; 32M at 1024 blows the 16M scoped-vmem limit)
BQ, LK, D = 256, 8192, 128
REPS = 20


def _serial_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...]
    s = jax.lax.dot_general(q, k_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(jnp.clip(s, -100.0, 100.0))
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    acc = jnp.dot(p.astype(v_ref.dtype), v_ref[...],
                  preferred_element_type=jnp.float32)
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _pipelined_kernel(q_ref, k_ref, v_ref, o_ref, *, nsub: int):
    q = q_ref[...]
    bk = LK // nsub
    # issue dot j+1 before exp2 j: independent chains the scheduler MAY
    # dual-issue (MXU j+1 under VPU/EUP j)
    s_prev = jax.lax.dot_general(q, k_ref[:bk], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    acc = jnp.zeros((q.shape[0], D), jnp.float32)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    for j in range(1, nsub):
        s_cur = jax.lax.dot_general(
            q, k_ref[j * bk:(j + 1) * bk], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp2(jnp.clip(s_prev, -100.0, 100.0))
        l = l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc + jnp.dot(p.astype(v_ref.dtype),
                            v_ref[(j - 1) * bk:j * bk],
                            preferred_element_type=jnp.float32)
        s_prev = s_cur
    p = jnp.exp2(jnp.clip(s_prev, -100.0, 100.0))
    l = jnp.maximum(l + jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    acc = acc + jnp.dot(p.astype(v_ref.dtype), v_ref[(nsub - 1) * bk:],
                        preferred_element_type=jnp.float32)
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _call(kernel):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BQ, D), jnp.bfloat16),
    )


def bench(fn, *args):
    out = fn(*args)
    np.asarray(out[:1, :1])  # force_ready: d2h barrier past remote compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def main():
    key = jax.random.PRNGKey(0)
    q = (jax.random.normal(key, (BQ, D), jnp.float32) * 0.1).astype(
        jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(1), (LK, D), jnp.float32)
         * 0.1).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (LK, D),
                          jnp.float32).astype(jnp.bfloat16)

    t_a, out_a = bench(jax.jit(_call(_serial_kernel)), q, k, v)
    print(f"A serial                  {t_a * 1e3:8.3f} ms")
    for nsub in (2, 4, 8, 16):
        fn = jax.jit(_call(functools.partial(_pipelined_kernel, nsub=nsub)))
        t_b, out_b = bench(fn, q, k, v)
        err = float(jnp.max(jnp.abs(out_a.astype(jnp.float32)
                                    - out_b.astype(jnp.float32))))
        print(f"B pipelined nsub={nsub:<2}       {t_b * 1e3:8.3f} ms   "
              f"(max|A-B| {err:.2e})   speedup {t_a / t_b:5.2f}x")


if __name__ == "__main__":
    main()
