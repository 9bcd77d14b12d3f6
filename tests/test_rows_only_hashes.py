"""Self-consistency pins for the rows-only (non-SQL-oracled) queries
(VERDICT r4 item 5): the driver's DuckDB gate can't check these, so
committed result fingerprints at sf0.001 stand in — a regression in
e.g. blob_near_dup or events_turntable_guidance fails here instead of
shipping silently. Regenerate after an INTENTIONAL semantics change
with ``python tests/regen_rows_only_hashes.py`` (fixture also carries
sf0.01 pins; the driver-side correctness run exercises that scale, so
the per-commit suite only replays the cheap sf0.001 set)."""

import json
import os

import pytest

from wine_label_ocr_ray.pipelines._qutil import result_fingerprint
from wine_label_ocr_ray.pipelines.queries import ORACLE_SQL, QUERIES

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "rows_only_hashes.json")
SF_TAG = "sf0.001"
SF_DIR = f"/root/testdata/{SF_TAG}"


def _pins():
    with open(FIXTURE) as f:
        return json.load(f)


def test_fixture_covers_every_rows_only_query():
    """Adding a rows-only query without pinning it must fail loudly."""
    rows_only = sorted(n for n in QUERIES if n not in ORACLE_SQL)
    pins = _pins()
    for tag in pins:
        assert sorted(pins[tag]) == rows_only, (
            f"{tag}: fixture out of date — run "
            "python tests/regen_rows_only_hashes.py")


@pytest.mark.parametrize("name",
                         sorted(n for n in QUERIES if n not in ORACLE_SQL))
def test_rows_only_query_fingerprint(ray_session, name):
    expected = _pins()[SF_TAG][name]
    got = result_fingerprint(QUERIES[name](SF_DIR))
    assert got == expected, (
        f"{name} result fingerprint drifted at {SF_TAG}: {got} != "
        f"{expected}. If the semantics change is intentional, run "
        "python tests/regen_rows_only_hashes.py and commit the diff.")
