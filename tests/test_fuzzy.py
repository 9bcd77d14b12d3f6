"""Truth-table tests for the fuzzy scorer — cases are the reference's
own commented examples (``MakerAndCustomIDSimilarity.py:99-137``)."""

import pytest

from wine_label_ocr_ray.functions import fuzzy as F


@pytest.mark.parametrize("m1,c1,m2,c2,maker_ok,cid_ok", [
    ("Château Margaux", "Château  Margaux|2019",
     "Chateau   Margaux", "Chateau Margaux | 2019", True, True),
    ("Robert Mondavi Winery", "Robert Mondavi Winery|2019",
     "Robert Mondavi", "Robert Mondavi|2019", True, True),
    ("Opus One", "Opus One|2019", "OPU-ON", "OPUS-ONE|2019", True, True),
    ("Opus One", "Opus One|2018", "Opus One", "Opus One|2019", True, False),
    ("Chateau Margaux", "Chateau Margaux|2015",
     "Chateau Margaux", "Chateau Margaux|2018", True, False),
    ("Robert Mondavi", "Robert Mondavi|2007",
     "Robert Mondavi", "Robert Mondavi|2019", True, False),
])
def test_reference_truth_table(m1, c1, m2, c2, maker_ok, cid_ok):
    assert F.is_maker_name_similar(m1, m2) is maker_ok
    assert F.is_custom_id_similar(c1, c2) is cid_ok


def test_null_handling():
    assert F.is_maker_name_similar(None, "Opus One") is False
    assert F.is_maker_name_similar("", "Opus One") is False
    assert F.strings_similar(None, None) is False


def test_vintage_and_barcode_equality():
    assert F.is_vintage_similar(2019, 2019) is True
    assert F.is_vintage_similar(2019, 2020) is False
    assert F.is_vintage_similar(None, 2019) is False
    assert F.is_vintage_similar(0, 0) is False          # falsy -> False
    assert F.is_barcode_similar("123", "123") is True
    assert F.is_barcode_similar("123", "124") is False
    assert F.is_barcode_similar(None, "123") is False


def test_token_set_ratio_known_values():
    # identical -> 100, subset -> 100 (token-set algebra)
    assert F.token_set_ratio("a b c", "a b c") == 100.0
    assert F.token_set_ratio("robert mondavi winery", "robert mondavi") == 100.0
    # rapidfuzz guard: either side empty -> 0 (FuzzyWuzzy-compat)
    assert F.token_set_ratio("", "") == 0.0
    assert F.token_set_ratio("", "hello world") == 0.0
    assert F.token_set_ratio("hello world", "") == 0.0
    assert F.token_set_ratio("abc", "xyz") < 30
    # published fuzzywuzzy example: token_set_ratio is symmetric
    a = "fuzzy was a bear"
    b = "fuzzy fuzzy was a bear"
    assert F.token_set_ratio(a, b) == 100.0
    assert F.token_set_ratio(b, a) == 100.0


def test_indel_ratio_matches_definition():
    # LCS("abcd","abxd") = 3 -> 200*3/8 = 75
    assert F.indel_ratio("abcd", "abxd") == 75.0
    assert F.indel_ratio("", "") == 100.0
    assert F.indel_ratio("a", "") == 0.0


def test_normalize():
    assert F.normalize("Château  Margaux") == "chateau margaux"
    assert F.normalize("A&B") == "a and b"
    assert F.normalize("Opus-One!") == "opus one"
    assert F.normalize("The Opus Winery", F.WINERY_WORDS) == "opus"


def test_extract_year():
    assert F.extract_year("Opus One|2019") == "2019"
    assert F.extract_year("no year") is None
    assert F.extract_year("21999") is None  # word-boundary anchored


def test_difflib_degraded_scorer():
    """Reference fallback parity (MakerAndCustomIDSimilarity.py:32):
    difflib SequenceMatcher ratio*100, order-sensitive, ignores the
    method selector — deliberately different from token_set."""
    import difflib

    from wine_label_ocr_ray.functions.fuzzy import difflib_score, score

    for a, b in [("opus one", "opus one"), ("opus one", "one opus"),
                 ("silver oak", "silver oak cellars"), ("", "x")]:
        expect = int(round(100 * difflib.SequenceMatcher(
            None, a, b).ratio()))
        assert difflib_score(a, b) == expect
        assert score(a, b, engine="difflib") == expect
        assert score(a, b, method="partial", engine="difflib") == expect
    # order sensitivity is the documented semantic difference
    assert score("opus one", "one opus", engine="difflib") < 100
    assert score("opus one", "one opus") == 100
