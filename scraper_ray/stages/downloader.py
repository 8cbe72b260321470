"""Pluggable page-resolver seam for the fetch stage.

The reference's core fetch operator is an HTTP GET behind a trait
(`/root/reference/worker/src/traits.rs:46-48`, `downloader.rs:26-41`); the
engine mirrors that seam so a deployment can swap the sandbox's deterministic
synthetic web for a real network client without touching the Fetcher /
WaveWorker hot paths.

A ``Downloader`` resolves frontier URLs to *payload handles* plus out-links
and an error kind per URL. Handles index the downloader's columnar payload
store (``image_id / blob / w / h / fmt / caption / phash`` lists): for
:class:`SynthWebDownloader` they point into the broadcast images table
(zero-copy — payload bytes are shared via ``ray.put`` once and never
duplicated per batch); for :class:`HTTPDownloader` they point into a
batch-local buffer of downloaded bytes. Handles are only valid until the next
``fetch_batch`` call.

Error kinds use the reference taxonomy (``functions/errors.py``): network
failures → ``NetworkError``, HTTP 5xx → ``ServerError``, HTTP 4xx →
``InvalidPage``, robots → ``RobotsDisallowed``.
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple

import numpy as np

from ..sources.synthweb import SynthWeb, SynthWebConfig
from ..state.ratelimit import WallClockTokenBucket


class PageBatch(NamedTuple):
    """Columnar result of one ``fetch_batch`` call (rows align with urls)."""

    payload_idx: np.ndarray  # int64 handle into the payload store; -1 on error
    links: list  # list[list[str]] out-links per page ([] on error / html mode)
    error_kind: list  # str per url; "" = ok


class Downloader:
    """Protocol base. Implementations provide:

    - ``html_mode`` (bool): True → pages carry an HTML body and links are
      extracted downstream; False → ``fetch_batch`` returns out-links
      directly (the vectorized scale path).
    - payload columns ``image_id, blob, w, h, fmt, caption, phash`` (lists
      addressed by the handles in :class:`PageBatch`).
    - ``fetch_batch(urls, hosts) -> PageBatch`` — the batched resolve.
    - html mode additionally: ``fetch_one(url) -> (error_kind, handle,
      body_html)``.
    """

    html_mode: bool = False
    image_id: list
    blob: list
    w: list
    h: list
    fmt: list
    caption: list
    phash: list

    def fetch_batch(self, urls: list, hosts: list,
                    retries=None) -> PageBatch:
        """Batched resolve. ``retries`` (optional int array aligned with
        urls) is the per-row attempt number — downloaders with
        attempt-dependent behaviour (SynthWeb's injected transient failures)
        use it; real-network downloaders may ignore it."""
        raise NotImplementedError

    def fetch_one(self, url: str, retries: int = 0):
        raise NotImplementedError

    def fetch_batch_html(self, urls: list, hosts: list,
                         retries=None) -> tuple[PageBatch, list]:
        """Batched html-mode resolve -> (PageBatch, bodies list[str]).

        Default composes per-row ``fetch_one`` — valid only for downloaders
        whose payload handles survive across ``fetch_one`` calls (SynthWeb's
        do: they index the broadcast images table). Downloaders with
        batch-scoped payload buffers (HTTPDownloader) must override.
        ``retries`` is advisory: a subclass whose ``fetch_one`` keeps the
        plain one-arg signature simply never sees attempt numbers."""
        aware = getattr(self, "_fetch_one_retry_aware", None)
        if aware is None:  # reflect once per instance, not per batch
            import inspect

            aware = "retries" in inspect.signature(
                self.fetch_one).parameters
            self._fetch_one_retry_aware = aware
        n = len(urls)
        idx = np.full(n, -1, dtype=np.int64)
        errs = [""] * n
        bodies = [""] * n
        for i, u in enumerate(urls):
            if aware:
                r = int(retries[i]) if retries is not None else 0
                errs[i], idx[i], bodies[i] = self.fetch_one(u, r)
            else:
                errs[i], idx[i], bodies[i] = self.fetch_one(u)
        return PageBatch(idx, [[] for _ in range(n)], errs), bodies


class SynthWebDownloader(Downloader):
    """Deterministic offline downloader over :class:`SynthWeb` — the
    sandbox stand-in for the network. ``fail_mod`` injects deterministic
    NetworkError rows (hash-selected URLs), modelling the reference's
    transient-download failures."""

    def __init__(self, images, web_cfg: dict, fail_mod: int = 0):
        cfg = SynthWebConfig(**{**web_cfg, "n_images": images.num_rows})
        self.web = SynthWeb(cfg)
        self.html_mode = cfg.html
        self.fail_mod = fail_mod
        # column-wise python lists once per actor; rows are tiny, access O(1)
        self.image_id = images["image_id"].to_pylist()
        self.blob = images["bytes"].to_pylist()
        self.w = images["w"].to_pylist()
        self.h = images["h"].to_pylist()
        self.fmt = images["fmt"].to_pylist()
        self.caption = images["caption"].to_pylist()
        self.phash = images["phash"].to_pylist()

    @staticmethod
    def _fail_salt(attempt: int) -> str:
        """Attempt-salted failure seed: attempt 0 keeps the historical
        ``fail::<url>`` form (bit-compatible with every pinned parity
        fixture); retry attempt k>0 hashes ``fail::r<k>::<url>`` so an
        injected transient failure is independent per attempt — without the
        salt a failed URL would fail deterministically forever and a bounded
        retry could never succeed."""
        return "fail::" if attempt == 0 else f"fail::r{attempt}::"

    def _failed_mask(self, urls: list, retries=None) -> np.ndarray:
        if not self.fail_mod:
            return np.zeros(len(urls), dtype=bool)
        from ..functions.hashing import hash64_batch

        if retries is None:
            salted = ["fail::" + u for u in urls]
        else:
            salted = [self._fail_salt(int(r)) + u
                      for u, r in zip(urls, retries)]
        return (hash64_batch(salted) % np.uint64(self.fail_mod)) == 0

    def fetch_batch(self, urls: list, hosts: list,
                    retries=None) -> PageBatch:
        img_idx, links, disallowed = self.web.page_batch(urls, hosts)
        failed = self._failed_mask(urls, retries)
        err = np.where(disallowed, "RobotsDisallowed",
                       np.where(failed, "NetworkError", ""))
        ok = ~(disallowed | failed)
        payload_idx = np.where(ok, img_idx, -1).astype(np.int64)
        return PageBatch(payload_idx,
                         [links[i] if ok[i] else [] for i in range(len(urls))],
                         err.tolist())

    def fetch_one(self, url: str, retries: int = 0):
        from ..functions.hashing import hash64

        if self.web.is_disallowed(url):
            return "RobotsDisallowed", -1, ""
        if (self.fail_mod
                and hash64(self._fail_salt(retries) + url)
                % self.fail_mod == 0):
            # deterministic injected transient failure — maps to the
            # reference's Reject outcome (errors.rs:89-183); requeued when
            # retry_limit > 0, recorded as an error row otherwise.
            return "NetworkError", -1, ""
        return "", self.web.image_index(url), self.web.html(url)

    def fetch_batch_html(self, urls: list, hosts: list,
                         retries=None) -> tuple[PageBatch, list]:
        """Vectorized html-mode resolve: robots + injected-failure + payload
        index are ONE batched-hash pass (identical decision order to
        ``fetch_one``: robots wins over failure); only the per-page html
        render stays a Python loop, and only for ok rows — the parse/extract
        analogue the reference also pays per page."""
        from ..functions.hashing import hash64_batch

        n = len(urls)
        img = (hash64_batch(["img::" + u for u in urls])
               % np.uint64(self.web.cfg.n_images)).astype(np.int64)
        disallowed = self.web.disallowed_batch(urls, hosts)
        failed = self._failed_mask(urls, retries)
        err = np.where(disallowed, "RobotsDisallowed",
                       np.where(failed, "NetworkError", ""))
        ok = ~(disallowed | failed)
        payload_idx = np.where(ok, img, -1).astype(np.int64)
        bodies = [self.web.html(urls[i]) if ok[i] else "" for i in range(n)]
        return (PageBatch(payload_idx, [[] for _ in range(n)], err.tolist()),
                bodies)


class HTTPDownloader(Downloader):
    """Real-network downloader skeleton (`downloader.rs:26-41` parity).

    Wall-clock politeness: one :class:`WallClockTokenBucket` per actor paces
    requests per host before each GET. The bucket is PER ACTOR: the crawl
    driver assigns wave chunks round-robin (a host's URLs can land on
    several workers in a wave), so a deployment must either (a) set
    ``rate_per_sec = host_rate / fetch_concurrency``, or (b) route chunks
    host-affine before relying on a full per-host rate. The engine's
    *semantic* politeness (``rate`` URLs released per host per wave in
    ``StateShard.drain``) bounds the global per-host request rate
    independently of this wall-clock layer.

    The socket layer (``_get``) raises ``NotImplementedError`` in this
    sandbox (no network); a deployment overrides it with an HTTP client
    returning ``(status_code, content_type, body_bytes)``. Payload metadata
    extraction (dimensions, caption, perceptual hash) is the deployment's
    decode stage — this skeleton stores raw bytes with the content-type as
    ``fmt`` and leaves the remaining columns None.
    """

    def __init__(self, rate_per_sec: float = 1.0, burst: float = 4.0,
                 timeout_s: float = 30.0, user_agent: str = "scraper-ray/0",
                 obey_robots: bool = True,
                 clock=time.monotonic, sleep=time.sleep):
        self.bucket = WallClockTokenBucket(rate_per_sec, burst, clock=clock)
        self._sleep = sleep
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.obey_robots = obey_robots
        self.html_mode = True
        # (scheme, host) -> list of disallowed path prefixes. Keyed by scheme
        # too: with a host-only key, the scheme of the FIRST URL seen for a
        # host would permanently decide the robots probe scheme — a host
        # first crawled over http whose robots.txt is https-only would fail
        # open for all later https URLs.
        self._robots: dict = {}
        self._reset_payloads()

    def _reset_payloads(self):
        self.image_id, self.blob, self.w, self.h = [], [], [], []
        self.fmt, self.caption, self.phash = [], [], []

    def _get(self, url: str):
        """-> (status_code, content_type, body_bytes). Override me."""
        raise NotImplementedError(
            "no network in this environment; plug an HTTP client here")

    @staticmethod
    def _parse_robots(body: str) -> list:
        """Disallow prefixes applying to ``*`` (minimal robots.txt subset:
        prefix matching, no wildcards/Allow). Consecutive ``User-agent``
        lines form one group (RFC 9309 §2.1) — the group's rules apply if
        ANY of its agents is ``*``, regardless of line order."""
        rules: list[str] = []
        group_has_star = False
        in_ua_run = False
        for line in body.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                if not in_ua_run:
                    group_has_star = False  # a new group starts
                in_ua_run = True
                if val == "*":
                    group_has_star = True
            else:
                in_ua_run = False
                if key == "disallow" and group_has_star and val:
                    rules.append(val)
        return rules

    def _robots_disallows(self, host: str, path: str,
                          scheme: str = "http") -> bool:
        """robots.txt check with a per-(scheme, host) fetch-once cache,
        requested over the SAME scheme as the page (an https-only host would
        reject a plain-http robots probe and silently fail open otherwise;
        caching by host alone would let the first URL's scheme decide the
        probe scheme for the host forever). The
        robots fetch itself goes through the token bucket (it is a
        request); a failed or unparseable robots.txt means allow-all (the
        conventional fail-open reading)."""
        scheme = scheme or "http"
        rules = self._robots.get((scheme, host))
        if rules is None:
            self.bucket.acquire(host, sleep=self._sleep)
            try:
                status, _ctype, body = self._get(
                    f"{scheme}://{host}/robots.txt")
                rules = (self._parse_robots(body.decode("utf-8", "replace"))
                         if status == 200 else [])
            except NotImplementedError:
                raise
            except Exception:
                rules = []
            self._robots[(scheme, host)] = rules
        return any(path.startswith(r) for r in rules)

    @staticmethod
    def _classify(status: int) -> str:
        if status >= 500:
            return "ServerError"
        if status >= 400:
            return "InvalidPage"
        if status >= 300:
            # a redirect reaching this skeleton means the plugged client has
            # redirect-following disabled (requests/httpx follow by default);
            # the Location body is NOT the page — record it, never store the
            # redirect body as a payload (mapped to Download::InvalidPage →
            # ERR row, the closest kind in the reference taxonomy)
            return "InvalidPage"
        return ""

    def _store(self, url: str, content_type: str, body: bytes) -> int:
        self.image_id.append(url)
        self.blob.append(body)
        self.w.append(None)
        self.h.append(None)
        self.fmt.append(content_type)
        self.caption.append(None)
        self.phash.append(None)
        return len(self.blob) - 1

    def fetch_one(self, url: str, retries: int = 0):
        # handles are valid until the next fetch_one/fetch_batch call — the
        # Fetcher consumes payload columns immediately; without this reset a
        # long-lived html-mode actor would accumulate every downloaded body
        self._reset_payloads()
        return self._fetch_one_noreset(url)

    def _fetch_one_noreset(self, url: str):
        """fetch_one core without the payload-buffer reset — the batch html
        path resets ONCE per batch so earlier rows' payload handles stay
        valid for the whole batch."""
        from urllib.parse import urlsplit

        from ..functions.urlnorm import host_of

        host = host_of(url)
        parts = urlsplit(url)
        if self.obey_robots and self._robots_disallows(
                host, parts.path or "/", parts.scheme):
            return "RobotsDisallowed", -1, ""
        self.bucket.acquire(host, sleep=self._sleep)
        try:
            status, ctype, body = self._get(url)
        except NotImplementedError:
            raise
        except Exception:
            return "NetworkError", -1, ""
        err = self._classify(status)
        if err:
            return err, -1, ""
        if ctype.startswith("text/html"):
            return "", -1, body.decode("utf-8", errors="replace")
        return "", self._store(url, ctype, body), ""

    def fetch_batch_html(self, urls: list, hosts: list,
                         retries=None) -> tuple[PageBatch, list]:
        # network GETs are inherently sequential per connection here; the
        # batch form exists so payload handles stay valid batch-wide
        self._reset_payloads()
        n = len(urls)
        idx = np.full(n, -1, dtype=np.int64)
        errs = [""] * n
        bodies = [""] * n
        for i, u in enumerate(urls):
            errs[i], idx[i], bodies[i] = self._fetch_one_noreset(u)
        return PageBatch(idx, [[] for _ in range(n)], errs), bodies

    def fetch_batch(self, urls: list, hosts: list,
                    retries=None) -> PageBatch:
        from urllib.parse import urlsplit

        self._reset_payloads()
        idx = np.full(len(urls), -1, dtype=np.int64)
        links: list = [[] for _ in urls]
        errs: list = [""] * len(urls)
        for i, (u, h) in enumerate(zip(urls, hosts)):
            parts = urlsplit(u)
            if self.obey_robots and self._robots_disallows(
                    h, parts.path or "/", parts.scheme):
                errs[i] = "RobotsDisallowed"
                continue
            self.bucket.acquire(h, sleep=self._sleep)
            try:
                status, ctype, body = self._get(u)
            except NotImplementedError:
                raise
            except Exception:
                errs[i] = "NetworkError"
                continue
            errs[i] = self._classify(status)
            if not errs[i]:
                idx[i] = self._store(u, ctype, body)
        return PageBatch(idx, links, errs)


class RecordingHTTPDownloader(HTTPDownloader):
    """Politeness-audit downloader: every ``_get`` appends
    ``host<TAB>monotonic_ts`` to a per-process log under ``record_dir`` and
    serves a deterministic same-host link tree (two child links per page;
    404 robots) — no network. This is the end-to-end probe for the
    wall-clock politeness contract: run a crawl with it (ideally under
    ``chunk_affinity='host'``) and check the recorded per-host request
    stream obeys ``requests in any window <= burst + rate * window``.
    Used by ``tests/test_crawl_extras.py`` and as a deployment dry-run
    ("does my affinity + bucket config actually bound per-host rates?")."""

    def __init__(self, record_dir: str, **kw):
        super().__init__(**kw)
        self.record_dir = record_dir

    def _get(self, url: str):
        from urllib.parse import urlsplit

        # urlsplit().hostname strips any :port and lowercases — a
        # split("/")[2] parse would mis-bucket hosts with explicit ports
        # (and crash on non-absolute URLs), corrupting the politeness audit
        host = urlsplit(url).hostname or ""
        path = os.path.join(self.record_dir, f"{os.getpid()}.log")
        with open(path, "a") as f:
            f.write(f"{host}\t{time.monotonic():.6f}\n")
        if url.endswith("/robots.txt"):
            return (404, "text/plain", b"")
        body = (f'<html><a href="{url}x/a">a</a>'
                f'<a href="{url}x/b">b</a></html>').encode()
        return (200, "text/html", body)
