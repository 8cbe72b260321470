"""Sequential reference oracle: the reference's crawl semantics in one process.

Implements the intent of the reference loop (`/root/reference/worker/src/worker.rs:58-172`)
— FIFO-ish frontier, atomic-intent seen set ("prevents work duplications",
`traits.rs:36`), per-page document-order link discovery — under the *same*
deterministic ordering contract as the Ray engine:

- canonical wave order ``(-priority, host, url)``;
- per-host politeness token buckets refilled once per wave;
- per-page keep-first link dedup (our deterministic replacement for the
  reference's order-destroying HashSet, `defaultnormaliser.rs:20-34`).

It shares only the *pure operator functions* (canonicalize, extract, filters,
synthweb, priority hash) with the engine; all orchestration (frontier, seen
set, waves, politeness, funnel counts) is an independent second
implementation, so the parity test genuinely cross-checks the distributed
engine's ordering, seen set, archive rows and funnel metrics.
"""

from __future__ import annotations

import heapq

from ..functions.hashing import hash64, hash64_batch, priority_of
from ..functions.urlnorm import canonicalize_batch, host_of
from ..sources.synthweb import SynthWeb, SynthWebConfig
from ..stages.extract import extract_links
from ..stages.filters import HostFilter


def oracle_crawl(cfg, images_table) -> dict:
    """cfg is a pipelines.crawl.CrawlConfig (only its semantic knobs are used).

    Returns {order: [(url, round, rank)], seen: sorted list,
    archive: [(url, round, image_id, caption)], metrics: [funnel dict/round]}.
    """
    assert cfg.max_wave_per_part == 0, "oracle does not model per-part wave caps"
    web = SynthWeb(SynthWebConfig(**{**cfg.web_dict(), "n_images": images_table.num_rows}))
    filt = HostFilter(cfg.filter_mode, cfg.filter_entries)
    image_ids = images_table["image_id"].to_pylist()
    captions = images_table["caption"].to_pylist()

    seen: set[str] = set()
    pending: dict[str, list] = {}  # host -> heap of (-prio, url, depth)
    tokens: dict[str, float] = {}

    def submit(urls, hosts, depth):
        n = 0
        for u, h in zip(urls, hosts):
            if not filt.keep(h):
                continue
            if u in seen:
                continue
            seen.add(u)
            prio = float(priority_of(hash64_batch([u]))[0])
            heapq.heappush(pending.setdefault(h, []), (-prio, u, depth))
            n += 1
        return n

    # seed: same canonicalize → filter → cull path as the engine
    canon, hosts = canonicalize_batch(cfg.seeds)
    submit(canon, hosts, 0)

    order_rows, archive_rows, metrics = [], [], []
    pages_total = 0
    for r in range(cfg.max_rounds):
        if cfg.max_pages and pages_total >= cfg.max_pages:
            break
        # politeness-budgeted drain, canonical order (-priority, host, url)
        wave = []
        for host in sorted(pending.keys()):
            heap = pending[host]
            tokens[host] = min(cfg.burst, tokens.get(host, 0.0) + cfg.rate)
            take = min(int(tokens.get(host, 0.0)), len(heap))
            for _ in range(take):
                negp, url, depth = heapq.heappop(heap)
                wave.append((-negp, host, url, depth))
            if take:
                tokens[host] -= take
            if not heap:
                del pending[host]
        if not wave:
            if not pending:
                break
            continue
        wave.sort(key=lambda t: (-t[0], t[1], t[2]))

        funnel = dict(
            round=r, pages=0, errors=0, extracted_links=0, normalised_links=0,
            filtered_links=0, culled_links=0, submitted_links=0,
        )
        for rank, (prio, host, url, depth) in enumerate(wave):
            order_rows.append((url, r, rank))
            funnel["pages"] += 1
            pages_total += 1
            if web.is_disallowed(url):
                funnel["errors"] += 1
                continue
            if cfg.fail_mod and hash64("fail::" + url) % cfg.fail_mod == 0:
                funnel["errors"] += 1
                continue
            idx = web.image_index(url)
            archive_rows.append((url, r, image_ids[idx], captions[idx]))
            if cfg.html:
                raw = extract_links(web.html(url), url)
            else:
                raw = web.out_links(url)
            canon, chosts = canonicalize_batch(raw)  # per-page keep-first
            kept = [(u, h) for u, h in zip(canon, chosts) if filt.keep(h)]
            # depth = round discovered (matches the engine's deterministic
            # definition under concurrent discovery)
            n_new = submit([u for u, _ in kept], [h for _, h in kept], r + 1)
            funnel["extracted_links"] += len(raw)
            funnel["normalised_links"] += len(canon)
            funnel["filtered_links"] += len(kept)
            funnel["culled_links"] += n_new
            funnel["submitted_links"] += n_new
        metrics.append(funnel)

    return {
        "order": order_rows,
        "seen": sorted(seen),
        "archive": sorted(archive_rows),
        "metrics": metrics,
        "pages_total": pages_total,
    }
