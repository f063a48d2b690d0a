"""Multi-host runtime: 2-process jax.distributed on CPU.

The reference initialises its distributed runtime on every launch
(LVM/acceleration/parallel_states.py:66-81, via torchrun env). Here
``parallel.distributed.init_runtime`` wires ``jax.distributed`` from
env (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) and the drivers
call it (cli.cmd_train/cmd_generate). This test launches TWO real
processes against a localhost coordinator and asserts:

- the global runtime forms (process_count == 2),
- datasets shard by process index (disjoint, covering),
- each process computes a finite training loss on its shard,
- a cross-process allgather carries both losses to both processes.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import jax
# this jax build ignores the JAX_PLATFORMS env var (the 'axon' TPU plugin
# wins regardless); only the config flag reliably forces the CPU backend
jax.config.update("jax_platforms", "cpu")
from video_gpt_tpu.parallel.distributed import init_runtime, is_main_process
init_runtime()
import jax.numpy as jnp
assert jax.process_count() == 2, (jax.process_count(), jax.devices())

from video_gpt_tpu.data.video import VideoClipDataset
ds = VideoClipDataset("/root/reference/vids", frame_num=2, frame_interval=1,
                      target_resolution=(48, 64), seed=0,
                      shard_index=jax.process_index(),
                      shard_count=jax.process_count())
shard = sorted(os.path.basename(p) for p in ds.data)

# one finite loss on this process's shard (tiny model, local device)
from video_gpt_tpu.config import ModelConfig, stage_config
from video_gpt_tpu.layout import tokens_per_frame
from video_gpt_tpu.models.video_gpt import VideoGPT
from video_gpt_tpu.training.data import collate
from video_gpt_tpu.training.train_state import init_train_state, \
    make_train_step
cfg = ModelConfig.tiny(pos_embed_max_size=192, attn_impl="reference")
tcfg = stage_config(1, frame_num=2, mixed_precision="no")
model = VideoGPT(cfg, dtype=jnp.float32, train_init=True)
tb = collate([ds.sample(0)], tokens_per_frame(48, 64))
nn_, nc = tb.noisy_sel.shape[0], tb.clean_sel.shape[0]
hl, wl = 48 // 8, 64 // 8
x1 = jax.random.normal(jax.random.PRNGKey(7), (nn_, hl, wl, 4))
cl = jax.random.normal(jax.random.PRNGKey(8), (nc, hl, wl, 4))
params = model.init(jax.random.PRNGKey(3), tb.inputs.batch,
                    jnp.zeros((nn_, hl, wl, 4)), jnp.zeros((nn_,)),
                    jnp.zeros((nc, hl, wl, 4)))
state = init_train_state(model, params, tcfg)
step = make_train_step(model, tcfg, max_blocks=2)
inputs = tb.inputs._replace(x1=x1, clean_latents=cl)
_, metrics = step(state, jax.random.PRNGKey(0), inputs)
loss = float(metrics["loss"])

# collective across the two processes: both see both losses
from jax.experimental import multihost_utils
losses = multihost_utils.process_allgather(jnp.asarray([loss]))
print("RESULT " + json.dumps({
    "pid": jax.process_index(), "shard": shard, "loss": loss,
    "all_losses": [float(x) for x in losses.ravel()],
    "main": is_main_process()}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_runtime():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "",  # 1 local CPU device per process
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[-1][len("RESULT "):]))
    results.sort(key=lambda r: r["pid"])
    assert results[0]["main"] and not results[1]["main"]
    # dataset shards: disjoint and covering
    s0, s1 = set(results[0]["shard"]), set(results[1]["shard"])
    assert s0 and s1 and not (s0 & s1)
    assert s0 | s1 == {"bottel.mp4", "plane.mp4", "woman.mp4"}
    for r in results:
        assert np.isfinite(r["loss"])
    # the allgather carried both processes' losses to both processes
    expect = [results[0]["loss"], results[1]["loss"]]
    for r in results:
        assert np.allclose(r["all_losses"], expect, rtol=1e-6), (
            r["all_losses"], expect)
