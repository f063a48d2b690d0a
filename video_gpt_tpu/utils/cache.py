"""Persistent XLA compilation cache setup (compile once per program shape)."""
import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/video_gpt_tpu_xla")


def enable_compilation_cache(path: str = _DEFAULT_DIR) -> None:
    # per-backend subdir: CPU AOT entries are machine-feature sensitive and
    # reloading one compiled under different flags warns about SIGILL risk
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
