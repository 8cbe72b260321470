"""Host white/black-list filters with the reference's substring semantics.

`/root/reference/worker/src/filter/filter.rs:34-89`: an entry matches when it
is a **substring of the URL's host** (so entry ``h1.test`` matches host
``xh1.test``); a blacklist drops matching hosts, a whitelist keeps only
matching hosts; a URL *without* a host passes a blacklist but fails a
whitelist (the Rust code only tests ``host_str().is_some()`` branches).
Filter lists are read line-per-entry, trimmed (`filter.rs:93-105`).

Two call styles: a scalar predicate (oracle / per-page paths) and a
vectorized pyarrow mask for ``map_batches`` stages. Lists are tiny — they are
broadcast by closure capture, never shuffled.

DELIBERATE divergence: empty (blank-line) entries are dropped at
construction. The reference keeps trimmed blank lines, and since the empty
string is a substring of every host, ONE blank line in a blacklist file
silently blocks the entire crawl (every host matches) — we treat that as a
footgun, not a feature; an explicit match-everything entry is still
expressible (e.g. ``.``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def read_filter_file(path: str) -> list[str]:
    with open(path) as f:
        return [line.strip() for line in f]


class HostFilter:
    """mode: 'none' | 'black' | 'white'."""

    def __init__(self, mode: str = "none", entries: list[str] | None = None):
        assert mode in ("none", "black", "white")
        self.mode = mode
        self.entries = [e for e in (entries or []) if e]

    @classmethod
    def from_file(cls, mode: str, path: str) -> "HostFilter":
        return cls(mode, read_filter_file(path))

    def keep(self, host: str) -> bool:
        if self.mode == "none":
            return True
        matched = bool(host) and any(e in host for e in self.entries)
        return not matched if self.mode == "black" else matched

    def mask(self, hosts: pa.Array) -> pa.Array:
        """Vectorized keep-mask over a host column (pyarrow string array)."""
        if self.mode == "none":
            return pa.array([True] * len(hosts), pa.bool_())
        matched = None
        for e in self.entries:
            m = pc.match_substring(hosts, e)
            matched = m if matched is None else pc.or_kleene(matched, m)
        if matched is None:
            matched = pa.array([False] * len(hosts), pa.bool_())
        has_host = pc.not_equal(hosts, "")
        matched = pc.and_kleene(matched, has_host)
        if self.mode == "black":
            return pc.invert(pc.fill_null(matched, False))
        return pc.and_kleene(pc.fill_null(matched, False), has_host)

    def to_dict(self) -> dict:
        return {"mode": self.mode, "entries": list(self.entries)}

    @classmethod
    def from_dict(cls, d: dict) -> "HostFilter":
        return cls(d.get("mode", "none"), d.get("entries"))
