"""Shared utilities: logging setup, run tracking, misc helpers."""

from .logging import setup_logging  # noqa: F401
