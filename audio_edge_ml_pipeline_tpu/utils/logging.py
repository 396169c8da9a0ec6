"""Uniform logging configuration for every CLI (contract of reference
train.py:57-63: basicConfig(force=True) with one shared format), plus the
persistent XLA compilation cache shared by all pipeline stages."""

from __future__ import annotations

import logging
import os
from pathlib import Path


def enable_compilation_cache() -> None:
    """Point JAX at a persistent compilation cache so successive CLI stages
    (extract -> train -> tune -> optimize) reuse each other's XLA compiles.
    Measured on the tunneled TPU backend: 18.4 s -> 1.2 s for a warm mel
    compile across processes. Honors JAX_COMPILATION_CACHE_DIR; defaults to
    ~/.cache/aep_tpu_jax."""
    import sys

    if "jax" not in sys.modules:
        # jax-free CLIs (deploy/codegen, serve, augment) must not pay the
        # jax + TPU-plugin import cost for a cache they never use
        return
    try:
        import jax

        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or str(
            Path.home() / ".cache" / "aep_tpu_jax"
        )
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every compile, however small/fast
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # cache is an optimization; never block a CLI on it


def setup_logging(level: int = logging.INFO) -> None:
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)-7s %(name)s - %(message)s",
        force=True,
    )
    enable_compilation_cache()
