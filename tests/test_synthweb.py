"""Synthetic-web generator invariants: vectorized==scalar, html-mode and
direct-mode produce identical canonical link sets, robots determinism."""

from scraper_ray.functions.urlnorm import canonicalize_batch
from scraper_ray.sources.synthweb import SynthWeb, SynthWebConfig
from scraper_ray.stages.extract import extract_links


def _web(html=True):
    return SynthWeb(SynthWebConfig(n_hosts=15, max_degree=8, n_images=40, html=html))


URLS = (
    [f"http://h{k}.test/" for k in range(15)]
    + [f"http://h{k % 15}.test/p/{(k * 2654435761) & 0xFFFFFFFF:08x}" for k in range(40)]
    + ["http://h3.test/private/p/00aa"]
)


def test_page_batch_matches_scalar():
    web = _web(html=False)
    hosts = [u.split("/")[2] for u in URLS]
    img, links, dis = web.page_batch(URLS, hosts)
    for i, u in enumerate(URLS):
        assert int(img[i]) == web.image_index(u)
        assert links[i] == web.out_links(u)
        assert bool(dis[i]) == web.is_disallowed(u)


def test_html_and_direct_mode_same_canonical_links():
    web = _web(html=True)
    for u in URLS[:30]:
        raw_html = extract_links(web.html(u), u)
        canon_html, _ = canonicalize_batch(raw_html)
        canon_direct, _ = canonicalize_batch(web.out_links(u))
        assert canon_html == canon_direct, u


def test_html_contains_junk_anchors_dropped_by_extractor():
    web = _web(html=True)
    for u in URLS:
        if web.degree(u) >= 3:
            body = web.html(u)
            assert "mailto:" in body and "urn:" in body
            raw = extract_links(body, u)
            assert not any(l.startswith(("mailto:", "urn:")) for l in raw)
            break
    else:
        raise AssertionError("no page with degree >= 3 found")


def test_robots_deterministic_and_some_hosts_disallow():
    web = _web()
    dis = [h for h in (f"h{k}.test" for k in range(40))
           if web.host_disallows_private(h)]
    assert 0 < len(dis) < 40
    web2 = _web()
    assert dis == [h for h in (f"h{k}.test" for k in range(40))
                   if web2.host_disallows_private(h)]
    assert "Disallow: /private/" in web.robots_txt(dis[0])
