"""Named experiment/event logs.

Counterpart of ``rv::Log`` (``/root/reference/src/util/Log.{h,cpp}``: named
global XML event/result logs for experiments) — JSONL instead of XML, with
the same usage pattern: open named logs anywhere, append typed events,
flush to disk. Used by the CLI for per-scan statistics export.
"""

from __future__ import annotations

import json
import time
from typing import Any, Dict, Optional


class EventLog:
    def __init__(self, name: str, path: Optional[str] = None,
                 mode: str = "a"):
        self.name = name
        self.path = path
        self.events: list[dict] = []
        self._fh = open(path, mode) if path else None

    def log(self, event: str, **fields: Any) -> None:
        rec = {"t": time.time(), "log": self.name, "event": event, **fields}
        self.events.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


_logs: Dict[str, EventLog] = {}


def get_log(name: str, path: Optional[str] = None) -> EventLog:
    """Named global logs (the rv::Log::getInstance pattern)."""
    if name not in _logs:
        _logs[name] = EventLog(name, path)
    return _logs[name]
