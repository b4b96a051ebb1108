"""Registry-shape invariants for the driver contract (__ray_entry__.py).

The driver's correctness harness compares only the FIRST 50 entries of
``queries()`` against DuckDB (CORRECTNESS_r03 covered exactly dict positions
1-50, silently rotating 8 already-oracle-paired operators out of the window
when round 3 inserted new lanes earlier in the dict).  These tests pin the
ordering contract so a future insertion can never rotate a verified operator
out of the driver window again.

Round 4 grew the oracle-paired surface past 50 entries, so the contract is
now: the window is filled entirely with oracle-paired entries; the only
oracle-paired entries allowed outside it are the explicitly demoted
least-signal ones in ``_ORACLE_DEMOTED`` (still judge-checker/pytest
verified), which sit immediately after the window, ahead of every rows-only
lane.
"""

from __future__ import annotations

DRIVER_WINDOW = 50


def _registry():
    import __ray_entry__ as entry

    return list(entry.queries()), entry.oracle_sql()


def test_driver_window_is_filled_with_oracle_paired_queries():
    import __ray_entry__ as entry

    names, oracle = _registry()
    pos = {n: i for i, n in enumerate(names)}
    missing = sorted(k for k in oracle if k not in pos)
    assert not missing, f"oracle_sql keys with no queries() entry: {missing}"
    late = sorted((pos[k], k) for k in oracle if pos[k] >= DRIVER_WINDOW)
    # only explicitly demoted oracle entries may sit past the window, and
    # only when the oracle surface is larger than the window itself
    allowed = set(entry._ORACLE_DEMOTED)
    bad = [(p, k) for p, k in late if k not in allowed]
    assert not bad, (
        f"oracle-paired queries outside the driver's first-{DRIVER_WINDOW} "
        f"correctness window without an _ORACLE_DEMOTED entry: {bad}")
    if late:
        assert len(oracle) > DRIVER_WINDOW, (
            "oracle entries demoted although the whole oracle surface fits "
            f"the window: {late}")


def test_oracle_paired_queries_precede_all_rows_only_queries():
    # Stronger than the window test: the programmatic reorder in
    # _driver_window_order puts EVERY oracle-paired key first (demoted ones
    # immediately after the window-filling set), so the window property
    # survives any amount of future registry growth.
    names, oracle = _registry()
    n_oracle = len(oracle)
    head = names[:n_oracle]
    assert set(head) == set(oracle), (
        "first len(oracle_sql()) queries() entries are not exactly the "
        f"oracle-paired set; head={sorted(set(head) - set(oracle))} "
        f"missing={sorted(set(oracle) - set(head))}")


def test_window_remainder_goes_to_priority_rows_only_lanes():
    import __ray_entry__ as entry

    names, oracle = _registry()
    window = set(names[:DRIVER_WINDOW])
    n_slots = DRIVER_WINDOW - min(len(oracle), DRIVER_WINDOW)
    expected = list(entry._ROWS_ONLY_PRIORITY)[:n_slots]
    missing = [k for k in expected if k not in window]
    assert not missing, (
        f"priority rows-only lanes pushed out of the driver window: {missing}")


def test_demoted_oracle_entries_are_a_documented_minimum():
    import __ray_entry__ as entry

    names, oracle = _registry()
    # demotion is only for window overflow: never more demoted entries than
    # the overflow requires
    overflow = max(0, len(oracle) - DRIVER_WINDOW)
    assert len(entry._ORACLE_DEMOTED) == overflow, (
        f"_ORACLE_DEMOTED has {len(entry._ORACLE_DEMOTED)} entries but the "
        f"oracle surface overflows the window by {overflow}")
    # and the demoted entries sit immediately after the window, before any
    # rows-only lane
    for k in entry._ORACLE_DEMOTED:
        assert DRIVER_WINDOW <= names.index(k) < len(oracle)


def test_doc_counts_match_registry():
    """VERDICT r4 #8: COVERAGE.md / README registry counts went stale when
    the registry grew.  Pin the documented counts to the live registry so
    a future insertion fails this test instead of shipping stale docs."""
    import os
    import re

    names, oracle = _registry()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fname, pattern in (
            ("COVERAGE.md", r"(\d+) queries / (\d+)\s*\n?oracle-paired"),
            ("README.md", r"`queries\(\)` \((\d+) operators\).*?"
                          r"(\d+) SQL-expressible")):
        with open(os.path.join(repo, fname)) as f:
            text = f.read()
        m = re.search(pattern, text, re.DOTALL)
        assert m, f"{fname}: registry-count sentence not found"
        assert int(m.group(1)) == len(names), (
            f"{fname} says {m.group(1)} queries; registry has {len(names)}")
        assert int(m.group(2)) == len(oracle), (
            f"{fname} says {m.group(2)} oracle-paired; registry has "
            f"{len(oracle)}")


def test_registry_names_are_unique_and_callable():
    names, _ = _registry()
    assert len(names) == len(set(names))
    import __ray_entry__ as entry

    q = entry.queries()
    assert all(callable(v) for v in q.values())


def test_bench_headline_lanes_exist_in_registry():
    """bench.py's suite indexes queries() by name; a lane rename that
    misses bench.py would crash the per-round bench artifact run."""
    import ast
    import os

    names, _ = _registry()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "bench.py")) as f:
        tree = ast.parse(f.read())
    headline: list[str] | None = None
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(getattr(t, "id", None) == "headline"
                        for t in node.targets)):
            headline = [ast.literal_eval(e) for e in node.value.elts]
    assert headline, "bench.py headline list not found"
    missing = sorted(set(headline) - set(names))
    assert not missing, f"bench headline lanes missing from registry: {missing}"
