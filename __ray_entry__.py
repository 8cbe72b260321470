"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB. Neither
this module nor the library code calls ``ray.init``/``ray.shutdown`` — only
``bench.py``, CLI entry points and the test fixture own a Ray session.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: a full crawl wave loop over sf0.001-derived input.

    The images input table (BASELINE.json input_hint schema) takes its
    captions from the sf0.001 ``documents`` table, then the Ray-Data crawl
    engine runs end-to-end (drain → fetch/decode actor pool → archive append
    → canonicalize/filter → sharded seen-set anti-join → frontier insert →
    checkpoint) and the archived image+caption rows are returned as a
    ``ray.data.Dataset``.
    """
    import ray.data as rd

    from scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from scraper_ray.pipelines.queries import _head_texts
    from scraper_ray.sources.fixtures import build_images_table

    images = build_images_table(
        48, captions=_head_texts("/root/testdata/sf0.001"))

    out_dir = os.path.join(tempfile.gettempdir(), "scraper_ray_entry")
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(
        out_dir=out_dir,
        num_parts=4,
        max_rounds=4,
        n_hosts=12,
        max_degree=6,
        n_images=images.num_rows,
        html=True,
        rate=2.0,
        burst=3.0,
        fetch_concurrency=2,
    )
    run_crawl(cfg, images)
    archive = rd.read_parquet(os.path.join(out_dir, "archive"))
    return archive.drop_columns(["bytes"])  # stable, driver-friendly schema


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus the
    training-data operations (dedup families, similarity search, text
    analysis). Each callable takes ``sf_dir`` and returns a Dataset / pandas
    DataFrame / pyarrow Table with column names matching ``oracle_sql``."""
    from scraper_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names). Entries
    absent here (the MinHash/SimHash/ngram near-dup families and their
    clusters, IVF ANN, lang-id, quality scores, fingerprints, the
    multimodal and corpus pipelines) are not SQL-expressible → the driver
    records the weaker rows-only check."""
    from scraper_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
