"""Graceful-stop signal handling.

Equivalent of /root/reference/src/Signals.cpp: SIGINT sets a stop flag that
time loops check once per step (the run finishes the current step, writes a
restart dump if a RestartManager is attached, and exits cleanly); a second
SIGINT kills the process immediately.
"""

from __future__ import annotations

import signal

_stop_requested = False
_installed = False


def install() -> None:
    """Install the SIGINT handler (idempotent)."""
    global _installed
    if _installed:
        return

    def handler(signum, frame):
        global _stop_requested
        if _stop_requested:
            raise KeyboardInterrupt
        _stop_requested = True

    signal.signal(signal.SIGINT, handler)
    _installed = True


def stop_requested() -> bool:
    return _stop_requested


def reset() -> None:
    global _stop_requested
    _stop_requested = False
