"""URL kernels for the Common-Crawl-style (url, warc_ts, html, …) table.

Pure-python string kernels (urllib split + C-speed str ops per batch) used
by ``pipelines.weburl``.  The canonicalization policy is deterministic and
documented here once so every lane (snapshot dedup, domain rollups,
blocklists) agrees on what "the same page" means:

- scheme and host lowercased; userinfo dropped; default ports (:80 http,
  :443 https) dropped;
- fragments dropped;
- tracking query parameters dropped (``utm_*`` and the ``*clid``
  click-tracking ids by default) — the crawl-noise class that makes one
  page look like many.  The default set contains ONLY unambiguous
  click-tracking keys: the bare ``ref`` key in particular is semantically
  load-bearing on many sites (git-hosting refs, API object references),
  and dropping it would merge genuinely distinct pages which the snapshot
  dedup then permanently discards.  The key set is a parameter of
  ``canonicalize_url`` so a caller can tune it per corpus;
- remaining query parameters sorted by (key, value) so parameter order
  cannot split a page;
- path ``//`` runs collapsed; a trailing slash on a non-root path dropped.

``registrable_domain`` is the last-two-labels approximation (no public
suffix list ships in this environment — documented trade-off: ``co.uk``
style suffixes group one level too coarse).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit

# Unambiguous click-tracking keys only (ADVICE r4: the bare 'ref' key is
# load-bearing on many sites and must NOT be stripped by default).
DEFAULT_TRACKING_KEYS = frozenset(("fbclid", "gclid", "msclkid", "twclid",
                                   "yclid", "dclid"))
_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Already-canonical fast-path shape: lowercase http(s) scheme, lowercase
# dotted host with no userinfo/port/trailing dot, slash-separated path
# segments with no empty segment (//), no trailing slash, no query, no
# fragment.  Every string matching this is a FIXED POINT of
# ``canonicalize_url`` (pinned by a hypothesis property test), so the
# batch kernel can skip the pure-python urlsplit for it — on a real crawl
# that is the overwhelming majority of rows, and the check itself runs as
# one vectorized RE2 pass over the Arrow column.
FAST_CANONICAL_RE = r"^https?://[a-z0-9-]+(\.[a-z0-9-]+)*(/[^/?#\s]+)*$"


def canonicalize_url(url: str, tracking_keys=DEFAULT_TRACKING_KEYS) -> str:
    """One URL → its canonical form per the module policy; malformed
    inputs come back stripped-but-unparsed rather than raising (a crawl
    always contains garbage rows).  ``tracking_keys`` is the exact-match
    query-key drop set (``utm_*`` is always dropped by prefix); pass a
    wider set to reproduce an aggressive per-corpus policy."""
    try:
        parts = urlsplit(url.strip())
        # .port parses lazily and raises on garbage ('host:bad', ':1e9') —
        # it must sit INSIDE the guard for the no-raise contract to hold
        host = (parts.hostname or "").lower().rstrip(".")
        port = parts.port
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path
    while "//" in path:
        path = path.replace("//", "/")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    q = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
         if not k.startswith("utm_") and k not in tracking_keys]
    query = urlencode(sorted(q))
    out = f"{scheme}://{netloc}{path}" if scheme else f"{netloc}{path}"
    return f"{out}?{query}" if query else out


def canonicalize_urls(urls: list) -> list:
    return [canonicalize_url("" if u is None else u) for u in urls]


def url_host(url: str) -> str:
    """Lowercased hostname (no port, no userinfo, no trailing FQDN dot —
    'spam.test.' and 'spam.test' resolve identically and must group and
    block identically); '' for garbage."""
    try:
        return (urlsplit(url.strip()).hostname or "").lower().rstrip(".")
    except ValueError:
        return ""


def registrable_domain(url: str) -> str:
    """Last-two-labels registrable-domain approximation of the host."""
    host = url_host(url)
    labels = host.split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


def registrable_domains(urls: list) -> list:
    return [registrable_domain("" if u is None else u) for u in urls]
