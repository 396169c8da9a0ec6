"""Fleet monitoring dashboard.

Reads data/telemetry/*_telemetry.jsonl and data/device_stats/*_stats.json
(the formats written by the edge simulator / device tooling; reference
dashboard.py:12-70) and serves an auto-refreshing HTML dashboard: per-device
stat tiles, prediction class distribution, confidence histogram, and the
recent event table. Streamlit is not installed; the dashboard is a stdlib
HTTP server rendering static HTML.

CLI: python -m audio_edge_ml_pipeline_tpu.serve.dashboard [--port 8501]
        [--telemetry-dir data/telemetry] [--stats-dir data/device_stats]
"""

from __future__ import annotations

import argparse
import html
import json
import logging
from collections import Counter
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)


def load_telemetry(telemetry_dir: Path) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = {}
    if not telemetry_dir.exists():
        return out
    for f in sorted(telemetry_dir.glob("*_telemetry.jsonl")):
        device = f.name.replace("_telemetry.jsonl", "")
        events = []
        for line in f.read_text().splitlines():
            line = line.strip()
            if line:
                try:
                    events.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
        out[device] = events
    return out


def load_stats(stats_dir: Path) -> dict[str, dict]:
    out: dict[str, dict] = {}
    if not stats_dir.exists():
        return out
    for f in sorted(stats_dir.glob("*_stats.json")):
        device = f.name.replace("_stats.json", "")
        try:
            out[device] = json.loads(f.read_text())
        except json.JSONDecodeError:
            continue
    return out


def _bar(frac: float, width: int = 24) -> str:
    filled = int(round(max(0.0, min(1.0, frac)) * width))
    return "&#9608;" * filled + "&#9617;" * (width - filled)


def render(telemetry: dict[str, list[dict]], stats: dict[str, dict]) -> str:
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        "<meta http-equiv='refresh' content='5'>",
        "<title>Edge fleet dashboard</title>",
        "<style>body{font-family:monospace;margin:2em;background:#101418;color:#d8dee9}"
        "table{border-collapse:collapse}td,th{border:1px solid #333;padding:4px 10px}"
        "h2{color:#88c0d0}.tile{display:inline-block;border:1px solid #444;"
        "padding:10px 18px;margin:6px;border-radius:6px;background:#161b22}"
        ".big{font-size:1.6em;color:#a3be8c}</style></head><body>",
        "<h1>Edge fleet dashboard</h1>",
    ]
    if not telemetry and not stats:
        parts.append("<p>No telemetry yet. Waiting for devices...</p>")
    for device in sorted(set(telemetry) | set(stats)):
        events = telemetry.get(device, [])
        st = stats.get(device, {})
        parts.append(f"<h2>{html.escape(device)}</h2>")
        n_inf = st.get("total_inferences", len(events))
        avg_conf = st.get("avg_confidence")
        if avg_conf is None and events:
            confs = [e.get("confidence", 0.0) for e in events]
            avg_conf = sum(confs) / len(confs)
        uploads = st.get("uploads", sum(1 for e in events if e.get("uploaded")))
        parts.append("<div>")
        parts.append(f"<span class='tile'>inferences<br><span class='big'>{n_inf}</span></span>")
        parts.append(
            f"<span class='tile'>avg confidence<br><span class='big'>{(avg_conf or 0.0):.3f}</span></span>"
        )
        parts.append(f"<span class='tile'>uploads<br><span class='big'>{uploads}</span></span>")
        parts.append("</div>")
        if events:
            counts = Counter(e.get("prediction", "?") for e in events)
            total = sum(counts.values())
            parts.append("<h3>class distribution</h3><table>")
            for cls, cnt in counts.most_common():
                parts.append(
                    f"<tr><td>{html.escape(str(cls))}</td><td>{cnt}</td>"
                    f"<td>{_bar(cnt / total)}</td></tr>"
                )
            parts.append("</table><h3>recent events</h3><table>")
            parts.append("<tr><th>time</th><th>prediction</th><th>confidence</th><th>uploaded</th></tr>")
            for e in events[-12:][::-1]:
                parts.append(
                    f"<tr><td>{html.escape(str(e.get('timestamp', '')))}</td>"
                    f"<td>{html.escape(str(e.get('prediction', '')))}</td>"
                    f"<td>{e.get('confidence', 0.0):.3f}</td>"
                    f"<td>{'yes' if e.get('uploaded') else ''}</td></tr>"
                )
            parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


class DashboardHandler(BaseHTTPRequestHandler):
    telemetry_dir = Path("data/telemetry")
    stats_dir = Path("data/device_stats")

    def do_GET(self):  # noqa: N802
        page = render(load_telemetry(self.telemetry_dir), load_stats(self.stats_dir)).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(page)))
        self.end_headers()
        self.wfile.write(page)

    def log_message(self, fmt, *args):
        logger.debug(fmt, *args)


def create_server(telemetry_dir="data/telemetry", stats_dir="data/device_stats", port: int = 8501):
    handler = type(
        "Handler", (DashboardHandler,),
        {"telemetry_dir": Path(telemetry_dir), "stats_dir": Path(stats_dir)},
    )
    return ThreadingHTTPServer(("0.0.0.0", port), handler)


def main(argv=None) -> None:
    setup_logging()
    p = argparse.ArgumentParser(prog="python -m audio_edge_ml_pipeline_tpu.serve.dashboard")
    p.add_argument("--port", type=int, default=8501)
    p.add_argument("--telemetry-dir", default="data/telemetry")
    p.add_argument("--stats-dir", default="data/device_stats")
    args = p.parse_args(argv)
    server = create_server(args.telemetry_dir, args.stats_dir, args.port)
    logger.info("Dashboard on :%d", args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
