"""Console logger: rich-based progress/tables with a plain-text fallback.

Reference: threedgrut/utils/logger.py:41-153 (RichLogger singleton — progress
bars with it/s, rules, tables, tracked-task elapsed registry).
"""
from __future__ import annotations

import sys
import time
from typing import Dict, Optional


class Logger:
    def __init__(self, use_rich: Optional[bool] = None):
        if use_rich is None:
            use_rich = sys.stdout.isatty()
        self._console = None
        if use_rich:
            try:
                from rich.console import Console
                self._console = Console()
            except ImportError:
                pass
        self._tracked: Dict[str, float] = {}
        self._elapsed: Dict[str, float] = {}

    def info(self, msg: str) -> None:
        if self._console:
            self._console.log(msg)
        else:
            print(msg, flush=True)

    def warning(self, msg: str) -> None:
        self.info(f"WARNING: {msg}")

    def rule(self, title: str) -> None:
        if self._console:
            self._console.rule(title)
        else:
            print(f"===== {title} =====", flush=True)

    def table(self, title: str, rows: Dict[str, object]) -> None:
        if self._console:
            from rich.table import Table
            t = Table(title=title)
            t.add_column("key")
            t.add_column("value")
            for k, v in rows.items():
                t.add_row(str(k), str(v))
            self._console.print(t)
        else:
            print(f"-- {title} --", flush=True)
            for k, v in rows.items():
                print(f"  {k}: {v}", flush=True)

    # Tracked tasks (elapsed-time registry, reference logger.py:96-130).
    def start_task(self, name: str) -> None:
        self._tracked[name] = time.perf_counter()

    def end_task(self, name: str) -> float:
        dt = time.perf_counter() - self._tracked.pop(name, time.perf_counter())
        self._elapsed[name] = self._elapsed.get(name, 0.0) + dt
        return dt

    def elapsed(self) -> Dict[str, float]:
        return dict(self._elapsed)


logger = Logger()
