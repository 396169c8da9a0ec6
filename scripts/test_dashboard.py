#!/usr/bin/env python
"""Dashboard smoke test: write synthetic telemetry, render the page, and
optionally serve it (role of reference scripts/test_dashboard.py).

Usage: python scripts/test_dashboard.py [--serve] [--port 8501]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_edge_ml_pipeline_tpu.serve.dashboard import create_server, load_stats, load_telemetry, render  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--port", type=int, default=8501)
    args = ap.parse_args()

    root = Path(tempfile.mkdtemp(prefix="dash_smoke_"))
    tdir, sdir = root / "telemetry", root / "stats"
    tdir.mkdir()
    sdir.mkdir()
    events = [
        {"timestamp": datetime.now().isoformat(timespec="seconds"),
         "prediction": cls, "confidence": conf, "uploaded": conf < 0.6}
        for cls, conf in [("Fire", 0.91), ("Rain", 0.44), ("Wind", 0.77), ("Fire", 0.83)]
    ]
    (tdir / "smoke0_telemetry.jsonl").write_text("\n".join(json.dumps(e) for e in events))
    (sdir / "smoke0_stats.json").write_text(json.dumps(
        {"total_inferences": 4, "avg_confidence": 0.7375, "uploads": 1}))
    page = render(load_telemetry(tdir), load_stats(sdir))
    assert "smoke0" in page and "Fire" in page, "render failed"
    print(f"render OK ({len(page)} bytes of HTML)")
    if args.serve:
        server = create_server(tdir, sdir, args.port)
        print(f"serving smoke dashboard on http://localhost:{args.port} (Ctrl-C to stop)")
        server.serve_forever()


if __name__ == "__main__":
    main()
