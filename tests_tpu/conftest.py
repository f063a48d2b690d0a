"""Real-TPU kernel tests. Run on the chip with:

    python -m pytest tests_tpu/ -q

Unlike tests/ (which forces a CPU mesh for portability), this suite runs
the Pallas kernels COMPILED on the TPU — VMEM budgets, mosaic lowering and
bf16 accumulation are only exercised here. First run compiles (~1-3 min);
the persistent compilation cache makes reruns fast.
"""
import jax
import pytest

from video_gpt_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires a TPU backend")
        for item in items:
            item.add_marker(skip)
