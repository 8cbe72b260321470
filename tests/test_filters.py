"""Golden filter tests ported from
`/root/reference/worker/src/filter/filter.rs:132-259` (substring-of-host
semantics) plus vectorized-mask equivalence."""

import pyarrow as pa

from scraper_ray.stages.filters import HostFilter

LIST = ["reddit.com", "bbc.co.uk", "dr.dk"]


def test_whitelist():  # filter.rs:150-186
    w = HostFilter("white", LIST)
    assert w.keep("reddit.com")
    assert not w.keep("tv2.dk")
    assert w.keep("bbc.co.uk")
    assert not w.keep("okboomer.dk")


def test_blacklist():  # filter.rs:188-228
    b = HostFilter("black", LIST)
    assert not b.keep("reddit.com")
    assert b.keep("tv2.dk")
    assert b.keep("okboomer.dk")


def test_nofilter():  # filter.rs:230-259
    f = HostFilter("none")
    for h in ("tv2.dk", "bbc.co.uk", "dr.dk", "okboomer.dk", "facebook.com"):
        assert f.keep(h)


def test_substring_of_host_semantics():  # filter.rs:34-51: entry ⊂ host
    b = HostFilter("black", ["h1.test"])
    assert not b.keep("xh1.test")  # entry is substring of host → matched
    assert b.keep("h2.test")
    w = HostFilter("white", ["h1.test"])
    assert w.keep("xh1.test")


def test_hostless_urls():
    # reference only filters when host_str() is Some: blacklist passes,
    # whitelist rejects host-less URLs
    assert HostFilter("black", LIST).keep("")
    assert not HostFilter("white", LIST).keep("")


def test_vectorized_mask_matches_scalar():
    hosts = ["reddit.com", "tv2.dk", "xh1.test", "", "sub.bbc.co.uk", "dr.dk"]
    arr = pa.array(hosts, pa.string())
    for mode in ("none", "black", "white"):
        f = HostFilter(mode, LIST)
        mask = f.mask(arr).to_pylist()
        assert mask == [f.keep(h) for h in hosts], mode
