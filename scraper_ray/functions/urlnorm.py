"""URL canonicalization with the reference's normalisation semantics.

Reproduces, from scratch in Python, the observable behaviour of the reference
normaliser pipeline (d502e19/scraper, `worker/src/defaultnormaliser.rs:41-57`):

1. strip the fragment and sort the query parameters alphabetically
   (the `url_normalizer::normalize` step, `defaultnormaliser.rs:46-48`);
2. uppercase percent-encoded triplets in path and query
   (`defaultnormaliser.rs:83-127`, golden test `:151-160`);
3. lowercase scheme and host (`defaultnormaliser.rs:62-78`, tests `:163-210`);

plus the implicit normalisations the Rust `Url` parser applies at parse time,
pinned by the reference's own tests (`worker/src/task.rs:71-117`):

- default-port elision (``http://h:80`` == ``http://h``, test `:87-93`);
- empty path becomes ``/`` for special schemes (`defaultnormaliser.rs:137-148`);
- percent-encoding of characters that are invalid in path/query;
- invalid URLs (no scheme, bad host such as ``https://www.�.com``) are
  rejected (`task.rs:119-133`) — we return ``None`` and the caller drops them.

Pure functions only — no Ray imports; the batch wrapper is
:func:`canonicalize_batch` in this module.
"""

from __future__ import annotations

import re
from urllib.parse import quote, urlsplit

_DEFAULT_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}
# Schemes whose empty path is rewritten to "/" (the url crate's "special" schemes).
_SPECIAL_SCHEMES = {"http", "https", "ws", "wss", "ftp", "file"}

_SCHEME_RE = re.compile(r"^[a-z][a-z0-9+.\-]*$")
# registered-name host after lowercasing/IDNA: letters, digits, hyphen, dot,
# underscore and percent-triplets; IPv6 literals keep their brackets.
_HOST_RE = re.compile(r"^(\[[0-9a-f:.]+\]|[a-z0-9._\-~%]+)$")
_TRIPLET_RE = re.compile(r"%[0-9a-fA-F]{2}")

# pchar plus '/' (path) — '%' is safe so existing triplets are not re-encoded.
_PATH_SAFE = "/%:@!$&'()*+,;=~.-_"
_QUERY_SAFE = _PATH_SAFE + "?"


def _upper_triplets(s: str) -> str:
    """``foo%2a`` → ``foo%2A`` (defaultnormaliser.rs:103-127).

    DELIBERATE divergence: the reference's counter logic uppercases the two
    characters after EVERY ``%`` — including non-hex sequences such as
    ``%zx`` → ``%ZX``, which are not percent-triplets at all. We uppercase
    only valid hex triplets (the RFC 3986 §6.2.2.1 normalization); a non-hex
    ``%`` sequence is left as-is and later re-encoded as a literal ``%25``.
    The golden tests in tests/test_extract.py pin the triplet cases the two
    implementations agree on.
    """
    return _TRIPLET_RE.sub(lambda m: m.group(0).upper(), s)


def _canon_host(raw_host: str) -> str | None:
    host = raw_host.lower()
    if not host:
        return None
    if not host.isascii():
        # the url crate converts unicode hosts to punycode; invalid labels
        # (e.g. the replacement character, task.rs:129-133) fail the parse.
        try:
            host = host.encode("idna").decode("ascii")
        except (UnicodeError, UnicodeDecodeError):
            return None
    if not _HOST_RE.match(host):
        return None
    return host


def canonicalize(url: str) -> str | None:
    """Canonical form of an absolute URL, or ``None`` if invalid.

    Idempotent: ``canonicalize(canonicalize(u)) == canonicalize(u)``.
    """
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme or not _SCHEME_RE.match(scheme):
        return None

    netloc = ""
    host = None
    if parts.netloc:
        host = _canon_host(parts.hostname or "")
        if host is None:
            return None
        try:
            port = parts.port
        except ValueError:
            return None
        userinfo = ""
        if parts.username is not None:
            userinfo = parts.username
            if parts.password is not None:
                userinfo += ":" + parts.password
            userinfo += "@"
        netloc = userinfo + host
        if port is not None and port != _DEFAULT_PORTS.get(scheme):
            netloc += f":{port}"
    elif scheme in _SPECIAL_SCHEMES:
        # http(s) etc. require a host (the url crate cannot parse host-less
        # special-scheme URLs).
        return None

    path = quote(parts.path, safe=_PATH_SAFE)
    path = _upper_triplets(path)
    if not path and scheme in _SPECIAL_SCHEMES:
        path = "/"
    if not netloc and path.startswith("//"):
        # a host-less path must not begin with '//' — it would re-parse as an
        # authority component, breaking idempotence (e.g. 'urn:////')
        path = "/" + path.lstrip("/")

    out = f"{scheme}://{netloc}{path}" if (netloc or scheme in _SPECIAL_SCHEMES) else f"{scheme}:{path}"

    if parts.query:
        q = quote(parts.query, safe=_QUERY_SAFE)
        q = _upper_triplets(q)
        # url_normalizer sorts the raw `k=v` components alphabetically
        # (defaultnormaliser.rs:44-48 "ordering the query in alphabetic order")
        q = "&".join(sorted(q.split("&")))
        out += "?" + q
    # fragment dropped entirely (url_normalizer::normalize removes the hash)
    return out


def host_of(canonical_url: str) -> str:
    """Host of an already-canonical URL ('' for host-less schemes like urn:)."""
    try:
        return urlsplit(canonical_url).hostname or ""
    except ValueError:
        return ""


def canonicalize_batch(urls) -> tuple[list[str], list[str]]:
    """Canonicalize a sequence, dropping invalid entries and intra-batch
    duplicates (keep-first, document order — our deterministic replacement for
    the reference's order-destroying HashSet drain, defaultnormaliser.rs:20-34).

    Returns (canonical_urls, hosts), same length.
    """
    seen: set[str] = set()
    out_urls: list[str] = []
    out_hosts: list[str] = []
    for u in urls:
        c = canonicalize(u)
        if c is None or c in seen:
            continue
        seen.add(c)
        out_urls.append(c)
        out_hosts.append(host_of(c))
    return out_urls, out_hosts
