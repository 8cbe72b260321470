"""Deterministic synthetic web: ``page(url)`` as a pure function of the URL hash.

There is no network in this sandbox, so the reference's HTTP downloader
(`/root/reference/worker/src/downloader.rs:26-41`) becomes a deterministic
resolver: every canonical URL maps to (a) a list of out-links and (b) one
image+caption row index into the input images table. The URL address space is
addressed by 64-bit hashes — up to ~10^10 distinct URLs exist *logically*
without materialising anything; only visited pages are ever instantiated.

Two fetch modes:

- ``html=True`` (tests / small scale): the page is a real HTML body whose
  anchors exercise the reference extractor + normaliser edge cases
  (`/root/reference/worker/src/extractor/html.rs:93-172`,
  `defaultnormaliser.rs:131-211`): relative hrefs, ``mailto:``/``urn:`` links
  (dropped), uppercase scheme/host, explicit ``:80`` ports, fragments,
  ``%2a``-style triplets, duplicate links, anchors with no href.
- ``html=False`` (bench / large scale): ``out_links`` are returned directly.

Both modes canonicalize to exactly the same link set, so oracle and engine
agree regardless of mode.

Robots: a deterministic subset of hosts (hash-selected) disallow the path
prefix ``/private/``; a fraction of generated links point into it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.hashing import _splitmix_fin, hash64, hash64_batch

_M64 = (1 << 64) - 1


@dataclass(frozen=True)
class SynthWebConfig:
    n_hosts: int = 40
    max_degree: int = 8
    hot_host_pct: int = 30  # % of links landing on host 0 (skew knob)
    private_mod: int = 7  # 1/7th of links go under /private/
    robots_mod: int = 4  # 1/4 of hosts disallow /private/
    html: bool = True
    n_images: int = 0  # size of the images table (set from the table)

    def to_dict(self) -> dict:
        return self.__dict__.copy()


class SynthWeb:
    def __init__(self, cfg: SynthWebConfig):
        self.cfg = cfg
        self._robots_cache: dict[str, bool] = {}

    # -- structure ----------------------------------------------------------
    def degree(self, url: str) -> int:
        return hash64("deg::" + url) % (self.cfg.max_degree + 1)

    def _child(self, h: int, j: int) -> tuple[str, str]:
        """(host, path) of the j-th out-link of a page with link-seed ``h``."""
        hj = _splitmix_fin((h ^ (j * 0x9E3779B97F4A7C15 + 0x1234567)) & _M64)
        if hj % 100 < self.cfg.hot_host_pct:
            k = 0  # the hot host
        else:
            k = (hj // 100) % self.cfg.n_hosts
        leaf = f"{hj:016x}"
        if hj % self.cfg.private_mod == 0:
            path = f"/private/p/{leaf}"
        else:
            path = f"/p/{leaf}"
        return f"h{k}.test", path

    def out_links(self, url: str) -> list[str]:
        """Absolute, already-normal-form out-links of ``url`` (document order)."""
        h = hash64("link::" + url)
        d = self.degree(url)
        return [
            f"http://{host}{path}"
            for host, path in (self._child(h, j) for j in range(d))
        ]

    def image_index(self, url: str) -> int:
        assert self.cfg.n_images > 0, "n_images not configured"
        return hash64("img::" + url) % self.cfg.n_images

    # -- vectorized batch path (bench/scale mode; bit-identical to the
    #    scalar functions above — pinned by tests) --------------------------
    def disallowed_batch(self, urls: list[str],
                         hosts: list[str]) -> np.ndarray:
        """Vectorized robots decision: URL disallowed iff path under
        ``/private/`` AND the host disallows it — the ONE implementation
        shared by ``page_batch`` and the downloader's batched html path
        (scalar twin: :meth:`is_disallowed`); a semantics change here
        propagates to every mode instead of drifting."""
        n = len(urls)
        host_dis = np.fromiter(
            (self.host_disallows_private(hh) for hh in hosts),
            dtype=bool, count=n)
        # path.startswith('/private/') — find the first '/' after the scheme
        priv = np.fromiter(
            (u.startswith("/private/", u.find("/", 8)) if u.find("/", 8) > 0
             else False for u in urls),
            dtype=bool, count=n)
        return host_dis & priv

    def page_batch(self, urls: list[str], hosts: list[str]):
        """(image_idx int64[n], links list[list[str]], disallowed bool[n])
        computed with batch hashing — one numpy pass instead of per-URL
        Python hashing in the fetch hot loop."""
        n = len(urls)
        cfg = self.cfg
        img = (hash64_batch(["img::" + u for u in urls])
               % np.uint64(cfg.n_images)).astype(np.int64)
        deg = (hash64_batch(["deg::" + u for u in urls])
               % np.uint64(cfg.max_degree + 1)).astype(np.int64)
        h = hash64_batch(["link::" + u for u in urls])
        disallowed = self.disallowed_batch(urls, hosts)
        # child link matrix, vectorized per column j
        links: list[list[str]] = [[] for _ in range(n)]
        maxd = int(deg.max()) if n else 0
        with np.errstate(over="ignore"):
            for j in range(maxd):
                # mask the >64-bit python constant: h ^ c == h ^ (c & M64)
                hj = (h ^ np.uint64((j * 0x9E3779B97F4A7C15 + 0x1234567) & _M64))
                hj = (hj ^ (hj >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                hj = (hj ^ (hj >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                hj = hj ^ (hj >> np.uint64(31))
                hot = (hj % np.uint64(100)) < np.uint64(cfg.hot_host_pct)
                k = np.where(hot, np.uint64(0),
                             (hj // np.uint64(100)) % np.uint64(cfg.n_hosts))
                is_priv = (hj % np.uint64(cfg.private_mod)) == 0
                live = np.nonzero(deg > j)[0]
                for i in live:
                    leaf = f"{int(hj[i]):016x}"
                    seg = "/private/p/" if is_priv[i] else "/p/"
                    links[int(i)].append(f"http://h{int(k[i])}.test{seg}{leaf}")
        return img, links, disallowed

    # -- html rendering (test mode) ----------------------------------------
    def html(self, url: str) -> str:
        """HTML body whose extracted+canonicalized links == out_links(url).

        Child 0 is emitted as a *relative* href (same host as the page — the
        reference resolves relative hrefs against the base URL,
        extractor/html.rs:74-79). Child 1 is duplicated (keep-first dedup).
        Child 2 is emitted with uppercase scheme+host, an explicit ``:80``
        port and a fragment (all normalised away). Junk anchors (no href,
        mailto:, urn:) must be dropped by the extractor's scheme filter.
        """
        h = hash64("link::" + url)
        d = self.degree(url)
        kids = [self._child(h, j) for j in range(d)]
        from ..functions.urlnorm import host_of

        page_host = host_of(url)
        anchors: list[str] = []
        for j, (host, path) in enumerate(kids):
            if j == 0 and host == page_host:
                anchors.append(f'<a href="{path}">rel</a>')
            elif j == 1:
                anchors.append(f'<a href="http://{host}{path}">x</a>')
                anchors.append(f'<a href="http://{host}{path}">dup</a>')
            elif j == 2:
                anchors.append(
                    f'<a href="HTTP://{host.upper()}:80{path}#frag">shouty</a>'
                )
            else:
                anchors.append(f'<a href="http://{host}{path}">k{j}</a>')
        caption_idx = self.image_index(url)
        return (
            "<!DOCTYPE html><html><body>\n"
            "<a>no-href</a>\n"
            '<a href="mailto:someone@example.test">mail</a>\n'
            '<a href="urn:isbn:0451450523">urn</a>\n'
            + "\n".join(anchors)
            + f'\n<img src="/img/{caption_idx}.png" alt="payload"/></body></html>'
        )

    # -- robots -------------------------------------------------------------
    def host_disallows_private(self, host: str) -> bool:
        cached = self._robots_cache.get(host)
        if cached is None:
            cached = hash64("robots::" + host) % self.cfg.robots_mod == 0
            self._robots_cache[host] = cached
        return cached

    def robots_txt(self, host: str) -> str:
        """The robots.txt body a real fetch of http://host/robots.txt would get."""
        if self.host_disallows_private(host):
            return "User-agent: *\nDisallow: /private/\n"
        return "User-agent: *\nDisallow:\n"

    def is_disallowed(self, url: str) -> bool:
        from ..functions.urlnorm import host_of
        from urllib.parse import urlsplit

        parts = urlsplit(url)
        host = parts.hostname or ""
        return self.host_disallows_private(host) and parts.path.startswith("/private/")
