"""Persistent XLA compilation cache.

On this TPU setup compilation is remote and can take minutes for large
traced programs; the on-disk cache makes every run after the first start in
seconds. Call once at program start (bench, CLI, entry points)."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/drt_tpu_xla")


def enable_compilation_cache(path: str = _DEFAULT_DIR) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
