"""Pin tools/recall_bench.measure_recall's join semantics on a crafted
corpus: known planted pairs, known cluster labels, hand-computable recall."""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.recall_bench import measure_recall  # noqa: E402


@pytest.fixture()
def planted(tmp_path):
    base = tmp_path / "bench"
    cdir = base / "corpus"
    cdir.mkdir(parents=True)
    # truth sidecar: 3 exact pairs (2 recovered), 2 near j>=0.95 pairs
    # (1 recovered), 1 near pair below the band (ignored), 1 root row
    truth = pa.table({
        "url": ["e1", "e2", "e3", "n1", "n2", "lo", "root"],
        "root_url": ["root", "root", "root", "root", "root", "root", "root"],
        "kind": ["exact", "exact", "exact", "near", "near", "near", "unique"],
        "true_jaccard_to_root": [1.0, 1.0, 1.0, 0.96, 0.95, 0.85, 1.0],
    })
    pq.write_table(truth, base / "truth.parquet")
    return str(cdir)


def test_measure_recall_counts_and_ratios(planted, ray_session):
    import ray.data as rd

    # cluster labels: e1,e2 + n1 share root's cluster; e3, n2, lo don't
    assignments = rd.from_arrow(pa.table({
        "url": ["e1", "e2", "e3", "n1", "n2", "lo", "root"],
        "cluster_uid": [7, 7, 3, 7, 4, 5, 7],
    }))
    rec = measure_recall(planted, assignments)
    assert rec == {
        "n_pairs_exact": 3, "recall_exact": round(2 / 3, 6),
        "n_pairs_near_j095": 2, "recall_near_j095": 0.5,
    }


def test_measure_recall_missing_sidecar(tmp_path, ray_session):
    import ray.data as rd

    cdir = tmp_path / "no_truth" / "corpus"
    cdir.mkdir(parents=True)
    assignments = rd.from_arrow(pa.table({"url": ["a"], "cluster_uid": [1]}))
    assert measure_recall(str(cdir), assignments) is None
