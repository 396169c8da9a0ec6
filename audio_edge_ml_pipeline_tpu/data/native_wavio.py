"""ctypes bindings for the native batched WAV decoder (native/wavio.cpp).

Auto-builds native/libwavio.so with `make` on first use when a toolchain is
present; falls back silently to the pure-numpy codec in audio_io otherwise.
The batch entry point decodes N files in parallel C++ threads straight into
one padded (N, capacity) float32 matrix — the host side of the
decode/compute overlap in BatchedAudioExtractor.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libwavio.so"
_lib = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], capture_output=True, text=True, check=True, timeout=120
            )
        except Exception as exc:
            logger.debug("native wavio build unavailable (%s); using numpy codec", exc)
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.wavio_decode.restype = ctypes.c_long
        lib.wavio_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ]
        lib.wavio_decode_batch.restype = None
        lib.wavio_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        _lib = lib
        logger.debug("native wavio loaded: %s", _LIB_PATH)
    except OSError as exc:
        logger.debug("native wavio load failed (%s); using numpy codec", exc)
    return _lib


def available() -> bool:
    return _load() is not None


def decode(path: Path | str, capacity: int) -> Optional[tuple[np.ndarray, int]]:
    """Decode one file to mono float32 (trimmed to true length). None on
    any failure (caller falls back to the numpy codec)."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(capacity, np.float32)
    rate = ctypes.c_int(0)
    n = lib.wavio_decode(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity, ctypes.byref(rate),
    )
    if n < 0:
        return None
    return out[:n], rate.value


def decode_batch(paths: list[Path | str], capacity: int, n_threads: int = 0):
    """Parallel batch decode -> (waves (N, capacity) f32, lengths (N,),
    rates (N,)); lengths < 0 mark per-file failures. None when the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, capacity), np.float32)
    lengths = np.zeros(n, np.int64)
    rates = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.wavio_decode_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), capacity,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads,
    )
    return out, lengths, rates
