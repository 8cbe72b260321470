"""Wall-clock per-host token buckets for the real-HTTP politeness path.

The crawl's *semantic* politeness (what the oracle models and tests pin) is
the per-wave token bucket inside ``StateShard.drain`` — deterministic,
time-free. A real deployment fetching over HTTP additionally needs wall-clock
pacing inside the Fetcher actor so released URLs are not fired at a host
faster than ``rate`` req/s. That is this class: host-affine batch routing
guarantees one Fetcher owns each host's bucket (SURVEY.md §4.1).
"""

from __future__ import annotations

import time


class WallClockTokenBucket:
    def __init__(self, rate_per_sec: float, burst: float,
                 clock=time.monotonic):
        self.rate = float(rate_per_sec)
        self.burst = float(burst)
        self._clock = clock
        self._tokens: dict[str, float] = {}
        self._last: dict[str, float] = {}

    def _refill(self, host: str, now: float) -> None:
        last = self._last.get(host)
        if last is None:
            self._tokens[host] = self.burst
        else:
            self._tokens[host] = min(
                self.burst, self._tokens.get(host, 0.0) + (now - last) * self.rate
            )
        self._last[host] = now

    def try_acquire(self, host: str, n: float = 1.0) -> bool:
        """Non-blocking: take ``n`` tokens for ``host`` if available."""
        if n > self.burst:
            raise ValueError(f"n={n} exceeds burst={self.burst}; "
                             "it could never be satisfied")
        now = self._clock()
        self._refill(host, now)
        if self._tokens[host] >= n:
            self._tokens[host] -= n
            return True
        return False

    def wait_time(self, host: str, n: float = 1.0) -> float:
        """Seconds until ``n`` tokens would be available (0 if now)."""
        now = self._clock()
        self._refill(host, now)
        deficit = n - self._tokens[host]
        return max(0.0, deficit / self.rate) if self.rate > 0 else float("inf")

    def acquire(self, host: str, n: float = 1.0, sleep=time.sleep) -> None:
        """Blocking acquire — sleeps until tokens are available."""
        while not self.try_acquire(host, n):
            sleep(max(self.wait_time(host, n), 0.001))
