"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests model a multi-chip mesh without TPU hardware (build brief requirement).
Must run before any jax import."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Subprocess robustness: every CLI test's child interpreter inherits
# os.environ, and the environment's .axon_site sitecustomize dials the TPU
# tunnel from its register() at interpreter start — observed hanging a
# child for 20+ min under tunnel congestion even with JAX_PLATFORMS=cpu
# (the hang is in the PJRT plugin connect, before JAX picks a backend).
# Drop it from the inherited PYTHONPATH so children start tunnel-free;
# individual tests that need the repo on the path still set their own.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p
    for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and "axon_site" not in p
)

# Persistent XLA compilation cache for the whole suite (VERDICT r3 item 9):
# subprocess CLI tests and the dryrun tests compile near-identical programs
# in fresh interpreters — with the cache, later compiles hit earlier ones'
# entries (test_infra.py alone measured 92 s cold -> 48 s warm), and a suite
# re-run starts warm. Env vars (inherited by child interpreters) rather than
# jax.config so subprocesses get it before their first jax import.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/aep_xla_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# The environment's sitecustomize imports jax at interpreter start (before
# conftest), so the env var alone is too late; force the platform through
# jax.config before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# sitecustomize already imported jax, so the cache env vars above were read
# too late for THIS interpreter — mirror them through jax.config.
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# single place tools/ becomes importable for tests (serial_proto,
# convert_backbone_weights, ...) instead of per-module sys.path edits
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture()
def rng(request):
    """Fresh deterministic generator per test, seeded from the requesting
    node's name (stable crc32, not PYTHONHASHSEED-randomized hash()) —
    draws never depend on which tests ran before. A single shared stream
    made test data order-dependent: the CQT parity margin moved between
    1.8e-5 (full suite) and 2.25e-5 (standalone) on identical code.
    Longer-lived fixtures construct their own seeded generators."""
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.name.encode()))


@pytest.fixture(scope="session")
def fsc22_like_clip():
    """A 5 s, 16 kHz synthetic clip with tonal + noise + transient content —
    structured like an fsc22 recording so parity tests exercise realistic
    dynamic range (SURVEY.md hard part 1: test on realistic clips)."""
    rng = np.random.default_rng(42)
    sr = 16000
    t = np.arange(5 * sr) / sr
    y = (
        0.4 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 1312.5 * t + 0.3)
        + 0.1 * np.sin(2 * np.pi * 3275.0 * t**1.001)
        + 0.05 * rng.standard_normal(len(t))
    )
    # transient burst + quiet tail for dynamic range
    y[16000:17600] += 0.8 * rng.standard_normal(1600)
    y[64000:] *= 0.05
    return y.astype(np.float32)


@pytest.fixture(scope="session")
def clip_22050():
    rng = np.random.default_rng(2205)
    sr = 22050
    t = np.arange(3 * sr) / sr
    y = (
        0.5 * np.sin(2 * np.pi * 523.25 * t)
        + 0.2 * np.sin(2 * np.pi * 220.0 * t)
        + 0.08 * rng.standard_normal(len(t))
    )
    return y.astype(np.float32)
