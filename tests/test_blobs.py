"""Golden conformance + property tests for the blob operators.

Golden rows are the 5 real records in
``/root/reference/wine_database.jsonl``; the fingerprint op must
reproduce every stored ``blob_fingerprint`` byte-exactly
(FIXTURES.md F5)."""

import json
import os

import numpy as np
import pytest

from wine_label_ocr_ray.functions import blobs as B

REFERENCE_DB = "/root/reference/wine_database.jsonl"

GOLDEN_FINGERPRINTS = {"05c1f23cd8168073", "13febb3e78388e51",
                       "40be3cff0f083b2b", "276f5f8f97c9e9e7", "empty"}


def _load_reference_rows():
    with open(REFERENCE_DB) as f:
        return [json.loads(l) for l in f if l.strip()]


@pytest.mark.skipif(not os.path.exists(REFERENCE_DB),
                    reason="reference checkout not present")
def test_golden_fingerprints_reproduce():
    rows = _load_reference_rows()
    assert len(rows) == 5
    seen = set()
    for row in rows:
        fp = B.blob_fingerprint(row["blobs"], tuple(row["roi_shape"]))
        assert fp == row["blob_fingerprint"]
        seen.add(fp)
    assert seen == GOLDEN_FINGERPRINTS


def test_fingerprint_empty():
    assert B.blob_fingerprint([], (100, 100)) == "empty"


def test_fingerprint_order_invariant():
    blobs = [
        {"cx": 10.0, "cy": 20.0, "w": 5, "h": 6, "area": 20.0},
        {"cx": 30.0, "cy": 5.0, "w": 4, "h": 4, "area": 12.0},
    ]
    fp1 = B.blob_fingerprint(blobs, (100, 200))
    fp2 = B.blob_fingerprint(list(reversed(blobs)), (100, 200))
    assert fp1 == fp2


def _mk_blobdata(blobs, shape=(100, 200)):
    return {"roi_shape": list(shape), "blobs": blobs}


def _square_blob(x, y, s=10):
    return {"x": x, "y": y, "w": s, "h": s, "cx": x + s / 2, "cy": y + s / 2,
            "area": float(s * s), "aspect_ratio": 1.0, "solidity": 1.0,
            "extent": 1.0}


def test_self_similarity_is_high():
    bd = _mk_blobdata([_square_blob(10, 10), _square_blob(50, 40),
                       _square_blob(120, 70)])
    similar, details = B.blob_similarity(bd, bd, return_details=True)
    assert similar is True
    assert details["score"] == pytest.approx(1.0, abs=1e-6)
    assert details["matched_pairs"] == 3


def test_translation_invariance():
    a = [_square_blob(10, 10), _square_blob(50, 40), _square_blob(120, 70)]
    shifted = [_square_blob(15, 12), _square_blob(55, 42), _square_blob(125, 72)]
    similar = B.blob_similarity(_mk_blobdata(a), _mk_blobdata(shifted))
    assert similar is True


def test_empty_sides():
    full = _mk_blobdata([_square_blob(10, 10)])
    empty = _mk_blobdata([])
    # public API short-circuit: any empty side -> False, even both-empty
    assert B.blob_similarity(full, empty) is False
    assert B.blob_similarity(empty, empty) is False
    _, d = B.blob_similarity(empty, full, return_details=True)
    assert d["score"] == 0.0 and d["median_pair_cost"] == 1.0


def test_dissimilar_layouts():
    a = _mk_blobdata([_square_blob(10, 10), _square_blob(20, 80)])
    b = _mk_blobdata([_square_blob(150, 10, s=30), _square_blob(100, 50, s=3),
                      _square_blob(30, 30, s=18)])
    similar, d = B.blob_similarity(a, b, return_details=True)
    assert 0.0 <= d["score"] <= 1.0


def test_record_level_wrapper():
    bd = _mk_blobdata([_square_blob(10, 10)])
    r = {"BlobData": bd}
    assert B.is_blob_data_similar(r, r) is True
    assert B.is_blob_data_similar({}, r) is False
    assert B.is_blob_data_similar(None, None) is False


@pytest.mark.skipif(not os.path.exists(REFERENCE_DB),
                    reason="reference checkout not present")
def test_golden_rows_pairwise():
    """Pairs of real rows: self-pairs decide similar; empty-vs-nonempty
    decides False (FIXTURES.md F5)."""
    rows = _load_reference_rows()
    nonempty = [r for r in rows if r["blob_count"] > 0]
    empty = [r for r in rows if r["blob_count"] == 0]
    assert empty, "golden set includes an empty-fingerprint row"
    for r in nonempty:
        assert B.blob_similarity(r, r) is True
        assert B.blob_similarity(r, empty[0]) is False


def test_hungarian_matches_bruteforce():
    """Pure-numpy Hungarian solver vs exhaustive permutation search on
    small random matrices (square and rectangular)."""
    import itertools

    import numpy as np

    from wine_label_ocr_ray.functions.blobs import hungarian

    rng = np.random.RandomState(7)
    for trial in range(40):
        n = rng.randint(1, 6)
        m = rng.randint(1, 6)
        cost = rng.rand(n, m)
        pairs = hungarian(cost)
        assert len(pairs) == min(n, m)
        assert len({a for a, _ in pairs}) == len(pairs)
        assert len({b for _, b in pairs}) == len(pairs)
        got = sum(cost[a, b] for a, b in pairs)
        if n <= m:
            best = min(sum(cost[i, p[i]] for i in range(n))
                       for p in itertools.permutations(range(m), n))
        else:
            best = min(sum(cost[p[j], j] for j in range(m))
                       for p in itertools.permutations(range(n), m))
        assert abs(got - best) < 1e-9, (trial, got, best)


def test_hungarian_beats_greedy_on_crossing_matrix():
    """The documented greedy-vs-optimal divergence case: a crossing
    cost matrix where greedy's first pick forces a worse total."""
    import numpy as np

    from wine_label_ocr_ray.functions.blobs import (_assign_greedy,
                                                    _assign_hungarian)

    cost = np.array([[0.05, 0.10],
                     [0.10, 0.20]])
    g = _assign_greedy(cost, pair_threshold=0.22)
    h = _assign_hungarian(cost, pair_threshold=0.22)
    # greedy grabs the 0.05 cell, forcing the 0.20 cell: total 0.25;
    # the optimal assignment takes the two 0.10 cells: total 0.20
    assert sum(c for *_, c in g) == 0.05 + 0.20
    assert sum(c for *_, c in h) == 0.10 + 0.10


def test_blob_similarity_assign_seam():
    """assign="hungarian" plugs through blob_similarity and can change
    the score on crossing matrices while identical inputs still match."""
    from wine_label_ocr_ray.functions.blobs import blob_similarity

    blobs = [{"x": 1, "y": 1, "w": 4, "h": 4, "cx": 3.0, "cy": 3.0,
              "area": 16.0, "aspect_ratio": 1.0, "solidity": 1.0,
              "extent": 1.0},
             {"x": 10, "y": 10, "w": 4, "h": 4, "cx": 12.0, "cy": 12.0,
              "area": 16.0, "aspect_ratio": 1.0, "solidity": 1.0,
              "extent": 1.0}]
    bd = {"blob_count": 2, "blobs": blobs, "roi_shape": [20, 20]}
    sim_g, dg = blob_similarity(bd, bd, return_details=True)
    sim_h, dh = blob_similarity(bd, bd, return_details=True,
                                assign="hungarian")
    assert sim_g and sim_h
    assert dg["score"] == dh["score"] == 1.0
