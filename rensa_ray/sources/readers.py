"""Multi-format corpus readers → the canonical web-page Dataset.

The engine's canonical input schema (BASELINE.json ``input_hint``) is
``(url, warc_ts, html, text, lang)`` Parquet, but real corpora arrive as
JSONL dumps or CSV manifests too.  ``read_corpus`` normalizes any of the
three into a Dataset with at least (url, text) — downstream stages depend
only on the columns they select, so partial schemas are fine.

All readers are Ray Data natives (streaming, block-parallel); ``columns``
pushes projection into the parquet scan (JSON/CSV cannot project at read —
they drop columns in a map right after the scan instead).
"""

from __future__ import annotations


def read_corpus(path: str, format: str = "parquet",
                columns: list[str] | None = None,
                override_num_blocks: int | None = None):
    """path + format ("parquet" | "json" | "csv") → ray.data.Dataset."""
    import ray.data as rd

    if format == "parquet":
        return rd.read_parquet(path, columns=columns,
                               override_num_blocks=override_num_blocks)
    if format == "json":
        ds = rd.read_json(path, override_num_blocks=override_num_blocks)
    elif format == "csv":
        ds = rd.read_csv(path, override_num_blocks=override_num_blocks)
    else:
        raise ValueError(f"unknown corpus format {format!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_corpus_as(ds, path: str, format: str = "parquet") -> None:
    """Dataset → partitioned files (one per block; resumable layout)."""
    if format == "parquet":
        ds.write_parquet(path)
    elif format == "json":
        ds.write_json(path)
    elif format == "csv":
        ds.write_csv(path)
    else:
        raise ValueError(f"unknown corpus format {format!r}")
