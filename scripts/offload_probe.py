"""Probe XLA host-offload behaviour on this chip (axon v5e).

Three questions that decide the full-depth single-chip training design
(the TPU analogue of the reference's ZeRO-offload,
stage3_offload_bf16_dp.json):

1. Host<->device bandwidth through pinned_host round-trips.
2. Does ``lax.scan`` over a HOST-RESIDENT stacked weight stream layer
   slices on demand (device peak ~ one layer), or does XLA hoist one bulk
   h2d copy of the whole stack (device peak ~ the stack)?
3. Where do gradients w.r.t. a host-resident stack land, and what is the
   device peak of fwd+bwd?

Prints one JSON line per probe; reads ``compiled.memory_analysis()`` for
peak HBM so answers don't rely on OOM-or-not guesswork.
"""
import json
import time

import jax
import jax.numpy as jnp
from jax.sharding import SingleDeviceSharding

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

DEV = jax.devices()[0]
HOST = SingleDeviceSharding(DEV, memory_kind="pinned_host")
DEVM = SingleDeviceSharding(DEV, memory_kind="device")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def probe_bandwidth():
    """h2d and d2h separately; a reduction on the device side makes the h2d
    copy un-elidable, and alternating buffers defeat result caching."""
    big = [jax.device_put(jnp.full((64, 1024, 1024), float(i), jnp.float32),
                          HOST) for i in range(4)]
    jax.block_until_ready(big)

    @jax.jit
    def h2d_sum(a_host):
        return jnp.sum(jax.device_put(a_host, DEVM))

    h2d_sum(big[0]).block_until_ready()
    t0 = time.perf_counter()
    for i in range(4):
        h2d_sum(big[i]).block_until_ready()
    dt = (time.perf_counter() - t0) / 4
    emit(probe="h2d_256MB", ms=round(dt * 1e3, 2),
         gbps=round(0.25 / dt, 2))

    dev = [jnp.full((64, 1024, 1024), float(i), jnp.float32)
           for i in range(4)]
    jax.block_until_ready(dev)
    to_host = jax.jit(lambda a: jax.device_put(a + 1.0, HOST))
    to_host(dev[0]).block_until_ready()
    t0 = time.perf_counter()
    for i in range(4):
        to_host(dev[i]).block_until_ready()
    dt = (time.perf_counter() - t0) / 4
    emit(probe="d2h_256MB", ms=round(dt * 1e3, 2),
         gbps=round(0.25 / dt, 2))


def probe_scan_streaming():
    layers, d = 16, 4096  # 16 x 64MB = 1G stack
    w = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (layers, d, d),
                          jnp.bfloat16), HOST)
    x = jnp.ones((128, d), jnp.bfloat16)

    def trunk(w, x):
        def body(c, wi):
            # explicit h2d of THIS layer's slice (memory spaces are strictly
            # typed: host operands cannot feed dot_general directly)
            return jnp.tanh(c @ jax.device_put(wi, DEVM)), None
        out, _ = jax.lax.scan(body, x, w)
        return out

    fn = jax.jit(trunk)
    lowered = fn.lower(w, x)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    t0 = time.perf_counter()
    out = fn(w, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    emit(probe="scan_over_host_stack",
         stack_mb=round(w.size * 2 / 1e6),
         peak_hbm_mb=round(getattr(mem, "temp_size_in_bytes", -1) / 1e6),
         arg_hbm_mb=round(getattr(mem, "argument_size_in_bytes", -1) / 1e6),
         first_run_s=round(dt, 3))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(w, x))
    emit(probe="scan_over_host_stack_warm", s=round(time.perf_counter() - t0,
                                                    4))


def probe_grad_of_host_stack():
    layers, d = 16, 4096
    w = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (layers, d, d),
                          jnp.bfloat16), HOST)
    x = jnp.ones((128, d), jnp.bfloat16)

    def loss(w, x):
        def body(c, wi):
            return jnp.tanh(c @ jax.device_put(wi, DEVM)), None
        out, _ = jax.lax.scan(
            jax.checkpoint(body, policy=jax.checkpoint_policies
                           .nothing_saveable), x, w)
        return jnp.sum(out.astype(jnp.float32))

    fn = jax.jit(jax.grad(loss))
    compiled = fn.lower(w, x).compile()
    mem = compiled.memory_analysis()
    g = fn(w, x)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(w, x))
    dt = time.perf_counter() - t0
    emit(probe="grad_of_host_stack",
         grad_memory_kind=str(getattr(g.sharding, "memory_kind", "?")),
         peak_hbm_mb=round(getattr(mem, "temp_size_in_bytes", -1) / 1e6),
         out_hbm_mb=round(getattr(mem, "output_size_in_bytes", -1) / 1e6),
         warm_s=round(dt, 4))


def probe_host_compute_update():
    """AdamW-ish update with compute_on('device_host'): mu/nu/master stay
    host-resident, grads stream d2h, fresh bf16 params stream h2d."""
    try:
        from jax.experimental import compute_on
    except ImportError:
        emit(probe="host_compute_update", error="compute_on unavailable")
        return
    n = 64 * 1024 * 1024 // 4  # 64M f32 elements = 256MB
    mu = jax.device_put(jnp.zeros((n,), jnp.float32), HOST)
    master = jax.device_put(jnp.ones((n,), jnp.float32), HOST)
    grad = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def step(master, mu, grad):
        grad_h = jax.device_put(grad, HOST)  # d2h before mixing spaces
        with compute_on.compute_on("device_host"):
            g32 = grad_h.astype(jnp.float32)
            mu2 = 0.9 * mu + 0.1 * g32
            master2 = master - 1e-3 * mu2
            params_half = master2.astype(jnp.bfloat16)
        params_dev = jax.device_put(params_half, DEVM)
        return (jax.device_put(master2, HOST), jax.device_put(mu2, HOST),
                params_dev)

    out = step(master, mu, grad)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = step(out[0], out[1], grad)
    jax.block_until_ready(out)
    emit(probe="host_compute_update_256MB",
         warm_s=round(time.perf_counter() - t0, 4))


if __name__ == "__main__":
    for p in (probe_bandwidth, probe_scan_streaming,
              probe_grad_of_host_stack, probe_host_compute_update):
        try:
            p()
        except Exception as e:
            emit(probe=p.__name__, error=f"{type(e).__name__}: {str(e)[:300]}")
