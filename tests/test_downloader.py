"""The Downloader seam (stages/downloader.py): Fetcher driven through a fake
resolver, HTTP skeleton status classification, and wall-clock politeness.
Mirrors the reference's downloader trait boundary (traits.rs:46-48,
downloader.rs:26-41). Pure-Python — no Ray session needed."""

import numpy as np
import pyarrow as pa
import pytest

from scraper_ray.stages.downloader import (
    Downloader, HTTPDownloader, PageBatch, SynthWebDownloader,
)
from scraper_ray.stages.fetch import FETCH_SCHEMA, Fetcher


def _batch(urls):
    hosts = [u.split("/")[2] for u in urls]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "depth": pa.array([0] * len(urls), pa.int32()),
    })


class FakeHtmlDownloader(Downloader):
    """Minimal html-mode resolver: one canned payload, one canned page."""

    html_mode = True

    def __init__(self):
        self.image_id = ["imgA"]
        self.blob = [b"\x01\x02"]
        self.w, self.h = [2], [1]
        self.fmt, self.caption, self.phash = ["png"], ["cap"], [7]

    def fetch_one(self, url):
        if url.endswith("/404"):
            return "InvalidPage", -1, ""
        return "", 0, '<html><a href="http://a.example/x">x</a></html>'


class FakeDirectDownloader(FakeHtmlDownloader):
    """Direct-mode resolver exercising the vectorized Fetcher path."""

    html_mode = False

    def fetch_batch(self, urls, hosts):
        errs = ["NetworkError" if u.endswith("/down") else "" for u in urls]
        idx = np.array([-1 if e else 0 for e in errs], dtype=np.int64)
        links = [[] if e else ["http://a.example/next"] for e in errs]
        return PageBatch(idx, links, errs)


def test_fetcher_through_fake_html_resolver():
    f = Fetcher(downloader=FakeHtmlDownloader())
    out = f(_batch(["http://a.example/ok", "http://a.example/404"]))
    assert out.schema.equals(FETCH_SCHEMA)
    assert out["error_kind"].to_pylist() == ["", "InvalidPage"]
    assert out["image_id"].to_pylist() == ["imgA", None]
    assert out["bytes"].to_pylist() == [b"\x01\x02", None]
    assert out["body"][0].as_py().startswith("<html>")
    assert out["body"][1].as_py() == ""


def test_fetcher_through_fake_direct_resolver():
    f = Fetcher(downloader=FakeDirectDownloader())
    out = f(_batch(["http://a.example/ok", "http://a.example/down"]))
    assert out.schema.equals(FETCH_SCHEMA)
    assert out["error_kind"].to_pylist() == ["", "NetworkError"]
    assert out["links"].to_pylist() == [["http://a.example/next"], []]
    assert out["caption"].to_pylist() == ["cap", None]


def test_synthweb_downloader_batch_matches_scalar():
    """fetch_batch and fetch_one agree row-for-row (incl. injected failures)."""
    from scraper_ray.sources.fixtures import build_images_table

    images = build_images_table(8)
    dl = SynthWebDownloader(images, {"html": False}, fail_mod=3)
    urls = [f"http://site{i}.example.com/p/{i}" for i in range(20)]
    hosts = [u.split("/")[2] for u in urls]
    pb = dl.fetch_batch(urls, hosts)
    dl_html = SynthWebDownloader(images, {"html": True}, fail_mod=3)
    for i, u in enumerate(urls):
        err, idx, _body = dl_html.fetch_one(u)
        assert err == pb.error_kind[i], u
        if not err:
            assert idx == pb.payload_idx[i], u


class CannedHTTP(HTTPDownloader):
    def __init__(self, responses, **kw):
        super().__init__(**kw)
        self.responses = responses
        self.calls = []

    def _get(self, url):
        self.calls.append(url)
        r = self.responses[url]
        if isinstance(r, Exception):
            raise r
        return r


def test_http_downloader_status_classification():
    urls = ["http://h.example/a", "http://h.example/b", "http://h.example/c",
            "http://h.example/d", "http://h.example/img"]
    d = CannedHTTP(
        {
            urls[0]: (200, "text/html", b"<html></html>"),
            urls[1]: (503, "text/html", b""),
            urls[2]: (404, "text/html", b""),
            urls[3]: ConnectionError("boom"),
            urls[4]: (200, "image/png", b"\x89PNG"),
        },
        rate_per_sec=1000.0, burst=1000.0, obey_robots=False,
        clock=lambda: 0.0, sleep=lambda s: None,
    )
    pb = d.fetch_batch(urls, ["h.example"] * len(urls))
    assert pb.error_kind == ["", "ServerError", "InvalidPage", "NetworkError", ""]
    # ok rows got payload handles into the batch-local store
    assert pb.payload_idx[0] == 0 and pb.payload_idx[4] == 1
    assert d.blob[1] == b"\x89PNG" and d.fmt[1] == "image/png"
    # error rows carry no payload
    assert all(pb.payload_idx[i] == -1 for i in (1, 2, 3))


def test_http_downloader_paces_per_host():
    """Requests beyond the burst wait on the wall-clock token bucket."""
    t = [0.0]
    sleeps = []

    def clock():
        return t[0]

    def sleep(s):
        sleeps.append(s)
        t[0] += s

    urls = [f"http://h.example/{i}" for i in range(5)]
    d = CannedHTTP({u: (200, "text/html", b"") for u in urls},
                   rate_per_sec=1.0, burst=2.0, obey_robots=False,
                   clock=clock, sleep=sleep)
    d.fetch_batch(urls, ["h.example"] * 5)
    assert len(d.calls) == 5
    # burst of 2 free, then ~1s of simulated wait per request
    assert len(sleeps) > 0 and t[0] >= 2.9


def test_http_downloader_socket_is_a_stub():
    d = HTTPDownloader(clock=lambda: 0.0, sleep=lambda s: None)
    with pytest.raises(NotImplementedError):
        d.fetch_one("http://x.example/")


def test_fetch_one_html_honors_robots_and_failmod():
    from scraper_ray.functions.hashing import hash64
    from scraper_ray.sources.fixtures import build_images_table

    images = build_images_table(4)
    dl = SynthWebDownloader(images, {"html": True}, fail_mod=2)
    f = Fetcher(downloader=dl)
    assert f.dl is dl and f.web is dl.web

    # find one disallowed URL (robots blocks /private/ on some hosts) and
    # one fail-injected URL via the same rules the downloader applies
    urls = ([f"http://site{i}.example.com/private/{i}" for i in range(50)]
            + [f"http://site{i}.example.com/p/{i}" for i in range(50)])
    robots_url = next(u for u in urls if dl.web.is_disallowed(u))
    fail_url = next(u for u in urls if not dl.web.is_disallowed(u)
                    and hash64("fail::" + u) % 2 == 0)
    ok_url = next(u for u in urls if not dl.web.is_disallowed(u)
                  and hash64("fail::" + u) % 2 != 0)
    assert dl.fetch_one(robots_url)[0] == "RobotsDisallowed"
    assert dl.fetch_one(fail_url)[0] == "NetworkError"
    err, idx, body = dl.fetch_one(ok_url)
    assert err == "" and idx >= 0 and body.startswith("<!DOCTYPE html>")


def test_fetcher_html_page_without_payload_gets_none_columns():
    """A resolver returning ('', -1, body) — ok page, no stored payload
    (e.g. a real-HTTP HTML response) — must produce None payload columns,
    never index the store with -1 (which would attach another page's
    payload via negative indexing)."""

    class HtmlOnly(FakeHtmlDownloader):
        def fetch_one(self, url):
            return "", -1, "<html><body>no image here</body></html>"

    f = Fetcher(downloader=HtmlOnly())
    out = f(_batch(["http://a.example/page"]))
    assert out["error_kind"].to_pylist() == [""]
    assert out["image_id"].to_pylist() == [None]
    assert out["bytes"].to_pylist() == [None]
    assert out["body"][0].as_py().startswith("<html>")

    # and with verify_decode on, a payload-less ok page must not be
    # decode-verified (there is nothing to verify)
    f2 = Fetcher(downloader=HtmlOnly(), verify_decode=True)
    out2 = f2(_batch(["http://a.example/page"]))
    assert out2["error_kind"].to_pylist() == [""]


def test_http_downloader_honors_robots():
    """robots.txt is fetched once per host (cached), parsed for the
    User-agent:* Disallow prefixes, and enforced BEFORE the page GET;
    a missing/broken robots.txt fails open."""
    robots = b"User-agent: *\nDisallow: /private/\nDisallow: /tmp\n"
    d = CannedHTTP(
        {
            "http://h.example/robots.txt": (200, "text/plain", robots),
            "http://h.example/ok": (200, "text/html", b"<html></html>"),
            "http://h.example/ok2": (200, "text/html", b"<html></html>"),
            # note: no /private/x entry — it must never be requested
        },
        rate_per_sec=1000.0, burst=1000.0,
        clock=lambda: 0.0, sleep=lambda s: None,
    )
    assert d.fetch_one("http://h.example/private/x")[0] == "RobotsDisallowed"
    assert d.fetch_one("http://h.example/tmpfile")[0] == "RobotsDisallowed"
    assert d.fetch_one("http://h.example/ok")[0] == ""
    assert d.fetch_one("http://h.example/ok2")[0] == ""
    # robots fetched exactly once; the disallowed page never requested
    assert d.calls.count("http://h.example/robots.txt") == 1
    assert "http://h.example/private/x" not in d.calls
    # a host whose robots.txt errors fails open
    d2 = CannedHTTP({"http://r.example/p": (200, "text/html", b"")},
                    rate_per_sec=1000.0, burst=1000.0,
                    clock=lambda: 0.0, sleep=lambda s: None)
    assert d2.fetch_one("http://r.example/p")[0] == ""


def test_http_downloader_robots_group_and_scheme():
    """RFC 9309 group semantics: consecutive User-agent lines share one
    rule group ('*' anywhere in the run applies); and the robots probe
    uses the page's scheme (https page → https robots URL)."""
    robots = b"User-agent: *\nUser-agent: somebot\nDisallow: /private/\n"
    d = CannedHTTP(
        {
            "https://s.example/robots.txt": (200, "text/plain", robots),
            "https://s.example/ok": (200, "text/html", b""),
        },
        rate_per_sec=1000.0, burst=1000.0,
        clock=lambda: 0.0, sleep=lambda s: None,
    )
    assert d.fetch_one("https://s.example/private/x")[0] == "RobotsDisallowed"
    assert d.fetch_one("https://s.example/ok")[0] == ""
    assert d.calls[0] == "https://s.example/robots.txt"  # https, not http


def test_http_downloader_3xx_is_an_error_not_a_payload():
    """A redirect status (client redirect-following disabled) must be
    classified, never stored as the page's payload body."""
    d = CannedHTTP(
        {"http://h.example/moved": (301, "text/html",
                                    b"<html>Moved</html>")},
        rate_per_sec=1000.0, burst=1000.0, obey_robots=False,
        clock=lambda: 0.0, sleep=lambda s: None,
    )
    err, idx, body = d.fetch_one("http://h.example/moved")
    assert err == "InvalidPage" and idx == -1 and body == ""
    assert d.blob == []  # redirect body never entered the payload store
    pb = d.fetch_batch(["http://h.example/moved"], ["h.example"])
    assert pb.error_kind == ["InvalidPage"] and pb.payload_idx[0] == -1


def test_http_downloader_robots_cache_is_scheme_keyed():
    """A host first crawled over http must still probe the https robots.txt
    for later https URLs (host-only caching would fail open forever)."""
    robots = b"User-agent: *\nDisallow: /private/\n"
    d = CannedHTTP(
        {
            # http robots: broken (connection error) → http fails open
            "http://m.example/robots.txt": ConnectionError("no http"),
            "http://m.example/private/a": (200, "text/html", b""),
            # https robots: present and disallows /private/
            "https://m.example/robots.txt": (200, "text/plain", robots),
        },
        rate_per_sec=1000.0, burst=1000.0,
        clock=lambda: 0.0, sleep=lambda s: None,
    )
    assert d.fetch_one("http://m.example/private/a")[0] == ""  # fails open
    assert d.fetch_one("https://m.example/private/b")[0] == "RobotsDisallowed"
    assert "https://m.example/robots.txt" in d.calls


def test_fetcher_batch_paths_guard_payload_less_ok_rows():
    """fetch_batch returning ('', idx=-1) rows (ok, no payload) must yield
    None payload columns in BOTH batch paths — never index the store with a
    negative handle (which silently attaches the LAST page's payload)."""

    class MixedDirect(FakeHtmlDownloader):
        html_mode = False

        def __init__(self):
            super().__init__()
            self.image_id = ["img-0"]  # fixture-shaped id (verify path)

        def fetch_batch(self, urls, hosts):
            # row 0: ok with payload 0; row 1: ok with NO payload
            idx = np.array([0, -1], dtype=np.int64)
            return PageBatch(idx, [["http://a.example/n"], []], ["", ""])

    f = Fetcher(downloader=MixedDirect())
    out = f(_batch(["http://a.example/img", "http://a.example/plain"]))
    assert out["error_kind"].to_pylist() == ["", ""]
    assert out["image_id"].to_pylist() == ["img-0", None]
    assert out["bytes"].to_pylist() == [b"\x01\x02", None]
    # verify_decode must skip the payload-less row (nothing to verify) and
    # must not mark it DecodeError
    f2 = Fetcher(downloader=MixedDirect(), verify_decode=True)
    out2 = f2(_batch(["http://a.example/img", "http://a.example/plain"]))
    # the fake blob fails decode → row 0 DecodeError; the payload-less ok
    # row was skipped by verification and stays ok
    assert out2["error_kind"].to_pylist() == ["DecodeError", ""]


def test_http_downloader_payload_store_resets_per_fetch():
    """fetch_one must not accumulate payloads across calls (long-lived
    html-mode actors would otherwise grow without bound)."""
    urls = [f"http://h.example/img{i}" for i in range(5)]
    d = CannedHTTP({u: (200, "image/png", b"x" * 10) for u in urls},
                   rate_per_sec=1000.0, burst=1000.0, obey_robots=False,
                   clock=lambda: 0.0, sleep=lambda s: None)
    for u in urls:
        err, idx, _ = d.fetch_one(u)
        assert err == "" and idx == 0  # fresh store every call
    assert len(d.blob) == 1


def test_direct_mode_payloadless_chunk_writes_typed_archive(tmp_path):
    """A direct-mode wave chunk whose ok rows ALL lack payloads must write
    an archive fragment with the normal string/binary column types — an
    inferred null-typed fragment would break read_archive's concat against
    fragments from payload-carrying workers."""
    from scraper_ray.sources import tableio
    from scraper_ray.stages.fetch import WaveWorkerPool
    from scraper_ray.stages.filters import HostFilter

    class NoPayload(Downloader):
        html_mode = False

        def __init__(self):
            self.image_id, self.blob, self.w, self.h = [], [], [], []
            self.fmt, self.caption, self.phash = [], [], []

        def fetch_batch(self, urls, hosts):
            return PageBatch(np.full(len(urls), -1, dtype=np.int64),
                             [[] for _ in urls], [""] * len(urls))

    w = WaveWorkerPool(
        images_ref=None, web_cfg={}, fail_mod=0, shard_handles=[],
        filter_cfg=HostFilter("none", []).to_dict(), num_parts=1,
        archive_dir=str(tmp_path / "archive"),
        errors_dir=str(tmp_path / "errors"), downloader=NoPayload())
    out = w.process(_batch(["http://a.example/p1", "http://a.example/p2"]), 0)
    assert out["pages"] == 2 and out["errors"] == 0
    frag = tableio.read_table(str(tmp_path / "archive" / "round=0000"))
    assert frag.num_rows == 2
    assert frag.schema.field("image_id").type == pa.string()
    assert frag.schema.field("fmt").type == pa.string()
    assert frag.schema.field("caption").type == pa.string()
    assert frag.schema.field("bytes").type == pa.binary()
    assert frag["image_id"].null_count == 2
