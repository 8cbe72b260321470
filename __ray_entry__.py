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
    ``ray.data.Dataset`` with each row's ROUND-LEVEL FUNNEL METRICS
    attached from the metrics sink (reference K5), so the external smoke
    check exercises the archive AND metrics outputs in one stable schema:

        image_id:string, w:int32, h:int32, fmt:string, caption:string,
        phash:int64, url:string, host:string, round:int64(partition),
        round_pages:int64, round_errors:int64, round_submitted:int64

    (``bytes`` is dropped — payloads stay in the archive files.)
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
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

    # K5 metrics sink → tiny per-round dict, broadcast by closure capture
    funnel = {
        int(r["round"]): (int(r["pages"]), int(r["errors"]),
                          int(r["submitted_links"]))
        for r in pq.read_table(
            os.path.join(out_dir, "metrics.parquet"),
            columns=["round", "pages", "errors", "submitted_links"]
        ).to_pylist()
    }

    def attach_funnel(t: pa.Table) -> pa.Table:
        rounds = [int(r) for r in t["round"].to_pylist()]
        cols = list(zip(*(funnel[r] for r in rounds))) if rounds \
            else ([], [], [])
        return (t.append_column("round_pages", pa.array(cols[0], pa.int64()))
                .append_column("round_errors", pa.array(cols[1], pa.int64()))
                .append_column("round_submitted",
                               pa.array(cols[2], pa.int64())))

    archive = rd.read_parquet(os.path.join(out_dir, "archive"))
    return (archive.drop_columns(["bytes"])  # stable, driver-friendly schema
            .map_batches(attach_funnel, batch_format="pyarrow"))


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
