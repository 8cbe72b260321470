"""Lance table IO with a Parquet-directory fallback.

The north rule archives image+caption pairs into Lance tables. ``lance`` /
``pylance`` is not installable in this offline sandbox, so all table IO goes
through this seam: if ``import lance`` works we use it, otherwise a directory
of Parquet fragments with the identical Arrow schema (same columns, same
types) — the layout difference is invisible to every caller.

Fragments are written atomically (temp file + rename) and named by the caller
(e.g. ``round=0003-part`` …) so a resumed run can idempotently overwrite the
fragments of a replayed round instead of duplicating them.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance unavailable in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def append_fragment(table: pa.Table, path: str, name: str | None = None) -> str:
    """Append ``table`` to the dataset at ``path``; returns the fragment uri."""
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, path, mode="append" if os.path.exists(path) else "create")
        return path
    os.makedirs(path, exist_ok=True)
    name = name or uuid.uuid4().hex[:12]
    frag = os.path.join(path, f"{name}.parquet")
    tmp = frag + f".tmp-{uuid.uuid4().hex[:6]}"
    pq.write_table(table, tmp)
    os.replace(tmp, frag)
    return frag


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    if HAVE_LANCE and not os.path.isdir(path):  # pragma: no cover
        return lance.dataset(path).to_table(columns=columns)
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        tables = [pq.read_table(p, columns=columns) for p in parts]
        if not tables:
            raise FileNotFoundError(f"no parquet fragments under {path}")
        return pa.concat_tables(tables)
    return pq.read_table(path, columns=columns)


def ray_dataset(path: str, columns: list[str] | None = None):
    """The dataset as a ``ray.data.Dataset`` (streaming read, column-pruned)."""
    import ray.data as rd

    if HAVE_LANCE and not os.path.isdir(path):  # pragma: no cover
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)
