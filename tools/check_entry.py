"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir, compares row count +
schema + order-insensitive values against ``oracle_sql()`` via DuckDB.

    python tools/check_entry.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def compare(name: str, got, sql: str | None, con) -> str:
    import pyarrow as pa

    got_tbl = (pa.Table.from_pandas(got, preserve_index=False)
               if isinstance(got, pd.DataFrame) else got)
    got_df = got_tbl.to_pandas()
    if sql is None:
        return f"rows-only: {len(got_df)} rows"
    want_tbl = con.execute(sql).arrow()
    want_df = want_tbl.to_pandas()
    if sorted(got_df.columns) != sorted(want_df.columns):
        return f"SCHEMA MISMATCH got={list(got_df.columns)} want={list(want_df.columns)}"
    # dtype-EXACT: the driver's value hash is over raw Arrow values, so a
    # decimal128-vs-int64 or float32-vs-float64 drift hash-mismatches even
    # when every value is equal (round-4 dedup_savings red row).  Fail it
    # locally before the driver sees it.
    got_types = {f.name: f.type for f in got_tbl.schema}
    want_types = {f.name: f.type for f in want_tbl.schema}
    bad_types = {c: (str(got_types[c]), str(want_types[c]))
                 for c in got_types if got_types[c] != want_types[c]}
    if bad_types:
        return f"DTYPE MISMATCH (got, want): {bad_types}"
    cols = sorted(got_df.columns)
    g = got_df[cols].sort_values(cols).reset_index(drop=True)
    w = want_df[cols].sort_values(cols).reset_index(drop=True)
    if len(g) != len(w):
        return f"ROWCOUNT MISMATCH got={len(g)} want={len(w)}"
    for c in cols:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            if not np.allclose(gv.astype(float), wv.astype(float),
                               rtol=1e-9, atol=1e-12, equal_nan=True):
                bad = np.flatnonzero(~np.isclose(gv.astype(float), wv.astype(float),
                                                 rtol=1e-9, atol=1e-12))[:3]
                return f"VALUE MISMATCH col={c} rows={bad.tolist()} got={gv[bad]} want={wv[bad]}"
        else:
            if not (gv == wv).all():
                bad = np.flatnonzero(gv != wv)[:3]
                return f"VALUE MISMATCH col={c} rows={bad.tolist()} got={gv[bad]} want={wv[bad]}"
    return f"OK ({len(g)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(sf_dir)
            verdict = compare(name, got, oracles.get(name), con)
        except Exception as e:
            verdict = f"ERROR {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "ok" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"[{status}] {name:28s} {dt:6.1f}s  {verdict}")

    if only is None:
        t0 = time.time()
        try:
            res = mod.entry()
            tbl = mod._to_table(res)
            print(f"[ok] entry()                      {time.time()-t0:6.1f}s  "
                  f"{tbl.num_rows} rows, cols={tbl.column_names}")
        except Exception as e:
            failures += 1
            print(f"[FAIL] entry(): {type(e).__name__}: {e}")

    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
