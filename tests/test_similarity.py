"""ANN similarity search: IVF index recall vs brute force."""

from __future__ import annotations

import pytest

from big_data_spark.catalog import load_table
from big_data_spark.operators.similarity import (
    brute_force_topk,
    build_ivf_index,
    ivf_search,
)

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_ORACLE, "embeddings").cache()


@pytest.fixture(scope="module")
def query_vec(emb):
    return [float(x) for x in emb.filter(emb.vec_id == 0).first()["embedding"]]


def test_ivf_index_shapes(emb):
    idx = build_ivf_index(emb, nlist=8)
    assert idx.centroids.count() == 8
    assert idx.assigned.count() == emb.count()
    cells = {r["cell"] for r in idx.assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8))


def test_ivf_recall_vs_brute_force(emb, query_vec):
    exact = [r["vec_id"] for r in brute_force_topk(emb, query_vec, k=10).collect()]
    idx = build_ivf_index(emb, nlist=8)
    approx = [
        r["vec_id"] for r in ivf_search(idx, query_vec, k=10, nprobe=4).collect()
    ]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.6, (recall, exact, approx)
    # probing all cells must reproduce the exact result
    full = [
        r["vec_id"] for r in ivf_search(idx, query_vec, k=10, nprobe=8).collect()
    ]
    assert full == exact


def test_ivf_candidate_fraction(emb, query_vec):
    # the point of IVF: the probe scans a fraction of the corpus
    idx = build_ivf_index(emb, nlist=8)
    probed = ivf_search(idx, query_vec, k=10, nprobe=2)
    probe_cells = {r["cell"] for r in probed.select("cell").distinct().collect()}
    cand = idx.assigned.filter(idx.assigned.cell.isin(list(probe_cells))).count()
    assert cand < emb.count() * 0.75, (cand, emb.count())
