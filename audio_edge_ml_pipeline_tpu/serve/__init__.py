"""Resident services: ingestion HTTP API, monitoring dashboard, edge
simulator. FastAPI/Streamlit are not installed in this environment; the
services are implemented on the stdlib HTTP server with the same routes,
file formats, and telemetry contracts (reference api.py:12-46,
dashboard.py:12-219, edge_simulator.py:15-386)."""
