"""Registry-shape invariants for the driver contract (__ray_entry__.py).

The driver's correctness harness compares only the FIRST 50 entries of
``queries()`` against DuckDB (CORRECTNESS_r03 covered exactly dict positions
1-50, silently rotating 8 already-oracle-paired operators out of the window
when round 3 inserted new lanes earlier in the dict).  These tests pin the
ordering contract so a future insertion can never rotate a verified operator
out of the driver window again.
"""

from __future__ import annotations

DRIVER_WINDOW = 50


def _registry():
    import __ray_entry__ as entry

    return list(entry.queries()), entry.oracle_sql()


def test_every_oracle_paired_query_is_inside_the_driver_window():
    names, oracle = _registry()
    pos = {n: i for i, n in enumerate(names)}
    missing = sorted(k for k in oracle if k not in pos)
    assert not missing, f"oracle_sql keys with no queries() entry: {missing}"
    late = sorted((pos[k], k) for k in oracle if pos[k] >= DRIVER_WINDOW)
    assert not late, (
        f"oracle-paired queries outside the driver's first-{DRIVER_WINDOW} "
        f"correctness window: {late}")


def test_oracle_paired_queries_precede_all_rows_only_queries():
    # Stronger than the window test: the programmatic reorder in
    # _driver_window_order puts EVERY oracle-paired key first, so the
    # window property survives any amount of future registry growth.
    names, oracle = _registry()
    n_oracle = len(oracle)
    head = names[:n_oracle]
    assert set(head) == set(oracle), (
        "first len(oracle_sql()) queries() entries are not exactly the "
        f"oracle-paired set; head={sorted(set(head) - set(oracle))} "
        f"missing={sorted(set(oracle) - set(head))}")


def test_priority_rows_only_lanes_fill_the_rest_of_the_window():
    import __ray_entry__ as entry

    names, oracle = _registry()
    window = set(names[:DRIVER_WINDOW])
    n_slots = DRIVER_WINDOW - len(oracle)
    expected = list(entry._ROWS_ONLY_PRIORITY)[:n_slots]
    missing = [k for k in expected if k not in window]
    assert not missing, (
        f"priority rows-only lanes pushed out of the driver window: {missing}")


def test_registry_names_are_unique_and_callable():
    names, _ = _registry()
    assert len(names) == len(set(names))
    import __ray_entry__ as entry

    q = entry.queries()
    assert all(callable(v) for v in q.values())
