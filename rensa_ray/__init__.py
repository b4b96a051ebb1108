"""rensa_ray — a Ray-Data-native near-duplicate detection / data-processing engine.

A from-scratch reimplementation of the capabilities of beowolx/rensa
(reference at /root/reference, Rust + PyO3) re-expressed Ray-Data-first:

- ``kernels``   — pure numpy/python math (fxhash64, Xoshiro256++, MinHash,
                  band hashing).  No Ray imports; bit-exact vs the reference
                  math (see citations in each module).
- ``functions`` — vectorized per-batch functions (tokenize/shingle, text
                  stats, simhash, fingerprints) usable inside ``map_batches``.
- ``stages``    — Ray Data stage callables (actor-pool signature stage, band
                  explode, multimodal stubs).
- ``pipelines`` — end-to-end Dataset pipelines (near-dup flags, clustering,
                  exact dedup, knn, text analysis) plus connected components.
- ``sources``   — synthetic Common-Crawl-style corpus generator + readers.
- ``state``     — reference-API-compatible classes (RMinHash, CMinHash,
                  RMinHashLSH, deduplicators) and streaming dedup actors.

Library code never calls ``ray.init()``; sessions are owned by the caller
(bench.py / tests / the driver).
"""

from __future__ import annotations

__version__ = "0.1.0"


def _register_self_by_value() -> None:
    """Make Ray serialize this package by value.

    Ray workers are not guaranteed to have the repo directory on their
    ``sys.path`` (the driver may have imported us via a path hack), so UDFs
    defined in these modules are registered for pickle-by-value with Ray's
    vendored cloudpickle.  Costs one extra serialization of the module code
    per pipeline stage; removes any deployment assumption.
    """
    try:
        import importlib
        import pkgutil
        import sys

        from ray import cloudpickle as _rcp

        pkg = sys.modules[__name__]
        mods = [pkg]
        for info in pkgutil.walk_packages(pkg.__path__, prefix=__name__ + "."):
            try:
                mods.append(importlib.import_module(info.name))
            except Exception:
                pass
        for mod in mods:
            try:
                _rcp.register_pickle_by_value(mod)
            except Exception:
                pass
    except Exception:
        pass


_register_self_by_value()


_STATE_EXPORTS = {
    "RMinHash", "CMinHash", "RMinHashDigestMatrix", "RMinHashLSH",
    "RMinHashDeduplicator", "CMinHashDeduplicator",
}


def __getattr__(name):
    """Lazy top-level re-exports mirroring the reference's import surface
    (``from rensa import RMinHash, RMinHashLSH, ...`` — src/lib.rs:35-43)."""
    if name in _STATE_EXPORTS:
        from . import state

        return getattr(state, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
