"""Ordered log levels threaded through the tool chain
(reference: /root/reference/stencilflow/log_level.py:14-24)."""
from __future__ import annotations

import enum
import sys


class LogLevel(enum.IntEnum):
    NO_LOG = 0
    BASIC = 1
    MODERATE = 2
    FULL = 3


def log(level: LogLevel, threshold: "LogLevel | int", message: str,
        file=None) -> None:
    """Print ``message`` when ``threshold`` admits ``level``."""
    if int(threshold) >= int(level):
        print(message, file=file or sys.stdout)
