#!/usr/bin/env python
"""Pallas mel-kernel v3 tile sweep (VERDICT r2 item 9 / CLAUDE.md: the one
untried schedule — multi-tile grid, >=512-row tiles so Mosaic's per-tile
overhead amortizes; Pallas pipelines block DMA double-buffered by default).

Runs on the real chip: for each tile_t, time mel_power_pallas_folded vs the
XLA folded-gather path at the same batch, check parity, print a table +
one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audio_edge_ml_pipeline_tpu.ops import dsp
    from audio_edge_ml_pipeline_tpu.ops.pallas_mel import mel_power_pallas_folded

    sr, n, n_mels, n_fft, hop = 16000, 80000, 40, 512, 160
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    base = rng.standard_normal((8, n)).astype(np.float32) * 0.3
    base_dev = jax.device_put(jnp.asarray(base))
    waves = jax.jit(lambda b: jnp.tile(b, (B // 8, 1)))(base_dev)

    def barrier(out):
        out.block_until_ready()
        np.asarray(jax.device_get(out.ravel()[0]))

    def timed2(fn, iters=10, rounds=4):
        barrier(fn())

        def loop(k):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn()
            barrier(out)
            return time.perf_counter() - t0

        b1 = min(loop(iters) for _ in range(rounds))
        b2 = min(loop(2 * iters) for _ in range(rounds))
        d = (b2 - b1) / iters
        return b1 / iters if d <= 0.1 * b1 / iters else d

    xla = jax.jit(lambda w: dsp.melspectrogram(w, sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop))
    ref = np.asarray(xla(waves[:8]))
    results = {}
    t_x = timed2(lambda: xla(waves))
    results["xla"] = B / t_x
    print(f"xla folded-gather: {B / t_x:,.0f} clips/s")

    for tile_t in (128, 256, 512, 1024):
        try:
            f = jax.jit(lambda w, tt=tile_t: mel_power_pallas_folded(
                w, sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop, tile_t=tt))
            got = np.asarray(f(waves[:8]))
            err = float(np.max(np.abs(got - ref)))
            t_p = timed2(lambda: f(waves))
            results[f"pallas_t{tile_t}"] = B / t_p
            print(f"pallas tile_t={tile_t}: {B / t_p:,.0f} clips/s  parity vs xla {err:.1e}")
        except Exception as exc:
            results[f"pallas_t{tile_t}"] = f"failed: {str(exc).splitlines()[0][:120]}"
            print(f"pallas tile_t={tile_t}: FAILED {str(exc).splitlines()[0][:120]}")

    print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v) for k, v in results.items()}))


if __name__ == "__main__":
    main()
