"""Colored console logging (reference hyperbolic_vae/util.py:8-25)."""

from __future__ import annotations

import logging

_COLORS = {
    "DEBUG": "\033[36m",      # cyan
    "INFO": "\033[32m",       # green
    "WARNING": "\033[33m",    # yellow
    "ERROR": "\033[31m",      # red
    "CRITICAL": "\033[1;31m", # bold red
}
_RESET = "\033[0m"


class ColoredFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        color = _COLORS.get(record.levelname)
        return f"{color}{msg}{_RESET}" if color else msg


def configure_handler_for_script(level: str = "INFO") -> None:
    """Wire a colored stream handler onto the root logger, like every
    reference script does manually (e.g. scripts/_6:58-62)."""
    root = logging.getLogger()
    root.setLevel(level)
    handler = logging.StreamHandler()
    handler.setFormatter(
        ColoredFormatter("%(asctime)s %(name)s %(funcName)s %(levelname)s %(message)s")
    )
    root.addHandler(handler)
