"""Self-metrics registry (SURVEY §2.1 S9).

The reference registers five counters (``main.go:20-45``) and serves them in
Prometheus text exposition format on ``GET /metrics`` (``main.go:122``).
Same five counters, same exposition format; thread-safe because HTTP
handlers may run concurrently.
"""

from __future__ import annotations

import threading


class Counter:
    def __init__(self, name: str, help_text: str):
        self.name = name
        self.help = help_text
        self._value = 0.0
        self._lock = threading.Lock()

    def inc(self, n: float = 1.0) -> None:
        with self._lock:
            self._value += n

    @property
    def value(self) -> float:
        with self._lock:
            return self._value

    def expose(self) -> str:
        return (
            f"# HELP {self.name} {self.help}\n"
            f"# TYPE {self.name} counter\n"
            f"{self.name} {self.value:g}\n"
        )


class MetricsRegistry:
    """The reference's five counters (main.go:20-45)."""

    def __init__(self) -> None:
        self.samples_written_total = Counter(
            "samples_written_total", "Number of samples written to storage."
        )
        self.write_requests_total = Counter(
            "write_requests_total", "Number of remote-write requests received."
        )
        self.write_errors_total = Counter(
            "write_errors_total", "Number of remote-write requests that failed."
        )
        self.read_requests_total = Counter(
            "read_requests_total", "Number of remote-read requests received."
        )
        self.read_errors_total = Counter(
            "read_errors_total", "Number of remote-read requests that failed."
        )

    def expose(self) -> str:
        return "".join(
            c.expose()
            for c in (
                self.samples_written_total,
                self.write_requests_total,
                self.write_errors_total,
                self.read_requests_total,
                self.read_errors_total,
            )
        )
