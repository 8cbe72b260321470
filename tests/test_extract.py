"""Golden extractor tests ported from
`/root/reference/worker/src/extractor/html.rs:93-172`."""

from scraper_ray.stages.extract import extract_links


def test_link_extractor():  # html.rs:97-120
    html = """<!DOCTYPE html>
        <html><body>
        <a>one</a>
        <a href="http://example.com/">two</a>
        </body></html>"""
    assert extract_links(html, "http://ref.ref") == ["http://example.com/"]


def test_link_extractor_ref():  # html.rs:122-144 — relative href vs base url
    html = '<!DOCTYPE html><html><body><a href="/test">two</a></body></html>'
    assert extract_links(html, "http://ref.ref") == ["http://ref.ref/test"]


def test_link_extractor_http_only():  # html.rs:146-171 — scheme filter
    html = """<!DOCTYPE html><html><body>
        <a>one</a>
        <a href="http://example.com/">two</a>
        <a href="mailto:example.com/">two</a>
        <a href="urn:example.com/">two</a>
        </body></html>"""
    assert extract_links(html, "http://ref.ref") == ["http://example.com/"]


def test_document_order_and_quoting():
    html = (
        "<a href='http://a.test/1'>x</a>"
        '<A HREF="http://a.test/2">y</A>'
        "<a href=http://a.test/3>z</a>"
        '<a href="https://a.test/4">w</a>'
    )
    assert extract_links(html, "http://base.test/") == [
        "http://a.test/1",
        "http://a.test/2",
        "http://a.test/3",
        "https://a.test/4",
    ]


def test_relative_forms():
    html = '<a href="p/leaf">a</a><a href="../up">b</a><a href="#frag">c</a>'
    got = extract_links(html, "http://h.test/dir/page")
    assert got == [
        "http://h.test/dir/p/leaf",
        "http://h.test/up",
        "http://h.test/dir/page#frag",
    ]
