"""URL-level stages over the Common-Crawl-style corpus (input_hint schema:
url, warc_ts, html, text, lang).

- ``keep_latest_snapshot`` — crawl-snapshot dedup: one row per CANONICAL
  url (see ``functions.url`` for the policy), keeping the newest
  ``warc_ts`` capture.  The standard first tier of a multi-crawl merge:
  re-crawls and tracking-parameter aliases of a page collapse before any
  content-level dedup runs.
- ``domain_doc_counts`` — per registrable-domain page counts, the crawl
  composition rollup.
- ``filter_blocked_domains`` — drop pages whose registrable domain is on a
  blocklist; the list is captured in the map closure (blocklists are small
  by nature — ship ``ray.put`` + a lookup if yours is not).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.url import registrable_domains
from ..kernels.hashing import fxhash64_bytes_list
from .common import np_col, partitionwise

DEFAULT_PARTS = 32


def keep_latest_snapshot(ds, url_col: str = "url", ts_col: str = "warc_ts",
                         num_parts: int = DEFAULT_PARTS):
    """One row per canonical url, newest ``ts_col`` wins (ties break to the
    lexicographically smallest ORIGINAL url — deterministic at any
    partitioning).  One shuffle keyed on the canonical-url hash; full rows
    ride it once (the same payload-crosses-once class as corpus line
    dedup).  Grouping inside the partition is by the full canonical
    STRING, so hash collisions cannot merge pages.
    """

    def _canon(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.url import FAST_CANONICAL_RE, canonicalize_url

        # one vectorized RE2 pass marks already-canonical urls (proven
        # fixed points); only the crawl-noise minority pays the
        # pure-python urlsplit
        filled = pc.fill_null(batch[url_col], "")
        fast = pc.match_substring_regex(
            filled, FAST_CANONICAL_RE).to_numpy(zero_copy_only=False)
        urls = filled.to_pylist()
        canon = [u if f else canonicalize_url(u)
                 for u, f in zip(urls, fast)]
        key = fxhash64_bytes_list([c.encode("utf-8") for c in canon])
        return (batch.append_column("__canon", pa.array(canon, pa.string()))
                     .append_column("__key", pa.array(key, pa.uint64())))

    keyed = ds.map_batches(_canon, batch_format="pyarrow")

    def _elect(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns(["__canon", "__key"])
        import pyarrow.compute as pc

        canon = g["__canon"].to_numpy(zero_copy_only=False)
        # crawl garbage tolerance: a null warc_ts must not abort the stage
        # (to_numpy raises ArrowInvalid on nulls).  Coalesce for the SORT
        # KEY only — int64 min+1, NOT min: the lexsort key below negates,
        # and -int64.min wraps back to int64.min (the null capture would
        # WIN); -(min+1) == max, so a null-ts capture deterministically
        # loses to any dated one.  The output row keeps its null.
        ts = pc.fill_null(g[ts_col].combine_chunks().cast(pa.int64()),
                          np.iinfo(np.int64).min + 1).to_numpy()
        # null urls (canonicalized to "" upstream) must not poison the
        # object-array lexsort tiebreak — coalesce for the SORT KEY only,
        # output rows keep their original null
        urls = np.asarray(
            ["" if u is None else u for u in g[url_col].to_pylist()], object)
        # per canonical group: max ts, then min original url
        order = np.lexsort((urls, -ts, canon))
        canon_s = canon[order]
        first = np.ones(len(canon_s), bool)
        first[1:] = canon_s[1:] != canon_s[:-1]
        return (g.take(pa.array(order[first]))
                .drop_columns(["__canon", "__key"]))

    return partitionwise(keyed, _elect, "__key", num_parts)


def domain_doc_counts(ds, url_col: str = "url"):
    """(domain, n_docs) per registrable domain — crawl composition."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        doms = registrable_domains(batch[url_col].to_pylist())
        u, c = np.unique(np.asarray(doms, object), return_counts=True)
        return pa.table({"domain": pa.array(u.astype(str), pa.string()),
                         "n_docs": pa.array(c, pa.int64())})

    return (ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("domain").aggregate(Sum("n_docs", alias_name="n_docs")))


def filter_blocked_domains(ds, blocked, url_col: str = "url"):
    """Drop rows whose registrable domain is in ``blocked`` (a small set,
    captured in the closure).  Pure streaming filter, zero shuffles."""
    blocked = frozenset(blocked)

    def _filter(batch: pa.Table) -> pa.Table:
        doms = registrable_domains(batch[url_col].to_pylist())
        keep = np.fromiter((d not in blocked for d in doms), bool,
                           len(doms))
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow")
