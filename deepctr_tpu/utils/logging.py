"""Structured metrics logging (JSONL sink + stdout).

Reference parity: the reference prints epoch/AUC/logloss to stdout
(SURVEY.md §5 observability row); here every record is a JSON object
appended to a sink file and optionally echoed, so runs are machine-parsable.
"""

from __future__ import annotations

import json
import sys
import time


class MetricsLogger:
    def __init__(self, path: str | None = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = open(path, "a") if path else None

    def log(self, record: dict) -> None:
        rec = {"ts": time.time(), **record}
        line = json.dumps(rec, default=float)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line, file=sys.stdout, flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
