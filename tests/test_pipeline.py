"""End-to-end flagship pipeline vs the pure-Python oracle: per-row
span-sequence equality (kind, text, media_ref, order) + record-field
equality (the BASELINE.json north-rule invariant)."""

import pytest

from wine_label_ocr_ray.oracle import oracle_records
from wine_label_ocr_ray.pipelines.extract import build_extract_pipeline
from wine_label_ocr_ray.synth import generate_corpus

RECORD_FIELDS = ("custom_id", "maker_name", "maker_norm", "vintage",
                 "barcode", "key", "record_id", "valid", "mean_ocr_conf",
                 "raw")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus") / "c200")
    generate_corpus(out, num_docs=200, seed=42)
    return out


@pytest.fixture(scope="module")
def pipeline_records(ray_session, corpus):
    return build_extract_pipeline(corpus).take_all()


@pytest.fixture(scope="module")
def expected(corpus):
    return oracle_records(corpus)


def test_all_docs_present(pipeline_records, expected):
    assert len(pipeline_records) == 200
    assert {r["doc_id"] for r in pipeline_records} == set(expected)


def test_span_sequence_equality(pipeline_records, expected):
    for r in pipeline_records:
        got = [(s["kind"], s["text"], s["media_ref"], s["order"])
               for s in r["spans"]]
        want = [tuple(s) for s in expected[r["doc_id"]]["spans"]]
        assert got == want, f"span mismatch for {r['doc_id']}"


def test_record_fields_equal(pipeline_records, expected):
    for r in pipeline_records:
        o = expected[r["doc_id"]]
        for f in RECORD_FIELDS:
            assert r[f] == o[f], f"{r['doc_id']}.{f}: {r[f]!r} != {o[f]!r}"


def test_blob_fingerprints_equal(pipeline_records, expected):
    n_with_blob = 0
    for r in pipeline_records:
        o = expected[r["doc_id"]]
        assert r["blob"]["blob_fingerprint"] == o["blob"]["blob_fingerprint"]
        assert r["blob"]["blob_count"] == o["blob"]["blob_count"]
        if o["blob"]["roi_shape"] != [0, 0]:
            n_with_blob += 1
    assert n_with_blob > 50  # corpus actually exercises the media leg


def test_extraction_hit_rates(pipeline_records):
    """The corpus must exercise every path: vintages found, makers
    found, some docs with neither (invalid), barcodes present."""
    vintages = sum(1 for r in pipeline_records if r["vintage"] is not None)
    makers = sum(1 for r in pipeline_records if r["maker_name"])
    barcodes = sum(1 for r in pipeline_records if r["barcode"])
    invalid = sum(1 for r in pipeline_records if not r["valid"])
    assert vintages > 80
    assert makers > 80
    assert barcodes > 10
    assert invalid > 0


def test_autosize_pool_never_reserves_whole_cluster():
    """Regression: a pool holding every cluster CPU starves the
    upstream read task and deadlocks the stream (seen at 2 cpus)."""
    from wine_label_ocr_ray.pipelines.extract import autosize_pool
    for total in range(2, 65):
        size = autosize_pool(total)
        assert 1 <= size <= total - 1, (total, size)
    assert autosize_pool(2) == 1      # the observed deadlock shape
    assert autosize_pool(4) == 2      # unchanged from the old rule
    assert autosize_pool(32) == 16    # unchanged at full width
    # fractional actors: 0.5-cpu actors on 2 cpus leave a read slot
    assert autosize_pool(2, 0.5) == 2
    # multi-cpu actors never round down into a whole-cluster pool
    for total in range(3, 65):
        size = autosize_pool(total, 2.0)
        assert 1 <= size and size * 2.0 <= total - 1, (total, size)
    # degenerate sessions where ANY pool would hold every CPU must
    # raise, not return the deadlock shape the max(1, ...) floor
    # used to produce (1 actor on a 1-cpu session, one 2-cpu actor
    # on a 2-cpu session)
    import pytest
    with pytest.raises(ValueError):
        autosize_pool(1)
    with pytest.raises(ValueError):
        autosize_pool(2, 2.0)
