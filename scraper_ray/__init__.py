"""scraper_ray — a from-scratch Ray-Data-native distributed crawl frontier + fetch
scheduler with the query/data-processing capabilities of d502e19/scraper.

Layout:
    functions/  pure, vectorized per-value kernels (url canonicalization, hashing,
                image codecs, text statistics) — no Ray imports
    sources/    table IO (Lance with a Parquet-directory fallback), synthetic-web
                generator, deterministic fixtures
    stages/     map_batches stage bodies (fetch actor pool, extract, filters)
    state/      seen-set filters (bloom/cuckoo/exact) and the StateShard actor
                (seen shard + priority frontier + politeness + checkpoints)
    pipelines/  the crawl wave driver loop, the sequential oracle, and the
                generic dataset query suite exposed through __ray_entry__
"""

__version__ = "0.1.0"
