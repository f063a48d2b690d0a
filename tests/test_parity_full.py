"""Full-scale trained-weights parity harness (scripts/parity_full.py).

No trained weights exist in this environment, so the harness is validated
end-to-end at tiny scale with fabricated reference-format weights
(--selftest): checkpoint write -> load_reference_checkpoint -> torch oracle
rollout (LVM/model.py:399-501 + LVM/scheduler.py:161-204 recomposition) ->
framework production serving path -> MSE vs the <1e-2 BASELINE bar. With a
real checkpoint present (PARITY_MODEL_CKPT env), the full-scale number runs
too.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_harness_selftest(tmp_path):
    pytest.importorskip("torch")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/parity_full.py", "--selftest"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["selftest"] and res["passed"]
    assert res["latent_mse"] < 1e-4  # fp32 tiny scale is far under the bar


def test_parity_harness_skips_cleanly():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/parity_full.py"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert "skipped" in res


@pytest.mark.skipif(not os.environ.get("PARITY_MODEL_CKPT"),
                    reason="no trained reference weights in this "
                           "environment (set PARITY_MODEL_CKPT)")
def test_parity_full_scale():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/parity_full.py",
         "--model_ckpt", os.environ["PARITY_MODEL_CKPT"],
         "--steps", "2"],
        cwd=REPO, env=env, capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-4000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["passed"], res
