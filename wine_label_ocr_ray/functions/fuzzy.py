"""Fuzzy string similarity (reference-parity, dependency-free).

The reference scores maker names with ``rapidfuzz.fuzz.token_set_ratio``
(``ocr_scripts[NOT BEING USED]/scan_and_store.py:152``,
``similarity_functions/MakerAndCustomIDSimilarity.py:23-26``). rapidfuzz
is not available here, so ``token_set_ratio`` is re-implemented from the
public algorithm (FuzzyWuzzy/rapidfuzz token-set algebra over the
normalized InDel ratio). The reference's own difflib fallback
(``MakerAndCustomIDSimilarity.py:32``) has *different* semantics; we
implement the primary scorer and unit-test it on the truth table the
reference ships in comments (``MakerAndCustomIDSimilarity.py:99-137``).

Normalization / predicates are exact ports:
- ``ascii_fold``/``normalize`` -> ``MakerAndCustomIDSimilarity.py:42-54``
- ``strings_similar``          -> ``MakerAndCustomIDSimilarity.py:59-70``
- ``is_maker_name_similar``    -> ``MakerAndCustomIDSimilarity.py:80-83``
- ``is_custom_id_similar``     -> ``MakerAndCustomIDSimilarity.py:86-96``
  (hard rule: both years present and different -> False)
- ``extract_year``             -> ``MakerAndCustomIDSimilarity.py:73-75``
"""

from __future__ import annotations

import re
import unicodedata
from typing import Optional, Set

WINERY_WORDS = {
    "winery", "vineyard", "vineyards", "cellar", "cellars", "estate", "the",
    "co", "inc", "llc", "ltd", "domaine", "domaines", "chateau", "bodega",
    "bodegas", "weingut", "azienda", "tenuta", "cantina",
}

_PUNCT = re.compile(r"[^a-z0-9\s]")
_YEAR = re.compile(r"\b(19|20)\d{2}\b")


def ascii_fold(s: str) -> str:
    return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")


def normalize(s: Optional[str], strip_words: Optional[Set[str]] = None) -> str:
    if not s:
        return ""
    s = ascii_fold(s).lower().replace("&", " and ")
    s = _PUNCT.sub(" ", s)
    toks = [t for t in s.split() if t]
    if strip_words:
        toks = [t for t in toks if t not in strip_words]
    return " ".join(toks)


def _lcs_len(a: str, b: str) -> int:
    """Longest common subsequence length, O(len(a)*len(b)) rolling DP."""
    if not a or not b:
        return 0
    if len(b) > len(a):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        best = 0
        for j, cb in enumerate(b):
            best = prev[j] + 1 if ca == cb else max(prev[j + 1], cur[j])
            cur.append(best)
        prev = cur
    return prev[-1]


def indel_ratio(a: str, b: str) -> float:
    """Normalized InDel similarity * 100 (= rapidfuzz ``fuzz.ratio``):
    substitutions cost 2, so ratio = 200*LCS/(|a|+|b|)."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / total


def token_sort_ratio(a: str, b: str) -> float:
    sa = " ".join(sorted(a.split()))
    sb = " ".join(sorted(b.split()))
    return indel_ratio(sa, sb)


def partial_ratio(a: str, b: str) -> float:
    """Best InDel ratio of the shorter string vs any equal-length
    substring window of the longer (public fuzzywuzzy semantics)."""
    if len(a) > len(b):
        a, b = b, a
    if not a:
        return 100.0 if not b else 0.0
    if len(a) == len(b):
        return indel_ratio(a, b)
    best = 0.0
    for start in range(0, len(b) - len(a) + 1):
        best = max(best, indel_ratio(a, b[start:start + len(a)]))
        if best == 100.0:
            break
    return best


def token_set_ratio(a: str, b: str) -> float:
    """Public token-set algebra: dedup+sort tokens, compare
    sect vs sect+diff_ab vs sect+diff_ba, take the max InDel ratio."""
    return token_set_ratio_sets(set(a.split()), set(b.split()))


def token_set_ratio_sets(tokens_a: Set[str], tokens_b: Set[str]) -> float:
    """``token_set_ratio`` over pre-split token sets — the ratio depends
    only on the token sets, so callers scoring one side against many
    candidates (dedup probes vs a DB block) tokenize each side ONCE
    instead of re-splitting the same strings per comparison."""
    if not tokens_a or not tokens_b:
        # rapidfuzz/fuzzywuzzy guard: empty side scores 0 (prevents empty
        # maker_norm records from fuzzy-matching everything in dedup).
        return 0.0
    sect = tokens_a & tokens_b
    diff_ab = tokens_a - tokens_b
    diff_ba = tokens_b - tokens_a
    if sect and (not diff_ab or not diff_ba):
        return 100.0
    t0 = " ".join(sorted(sect))
    ab = " ".join(sorted(diff_ab))
    ba = " ".join(sorted(diff_ba))
    t1 = f"{t0} {ab}".strip()
    t2 = f"{t0} {ba}".strip()
    return max(indel_ratio(t0, t1), indel_ratio(t0, t2), indel_ratio(t1, t2))


def difflib_score(a: str, b: str) -> int:
    """The reference's DEGRADED-mode scorer
    (``MakerAndCustomIDSimilarity.py:32``): when rapidfuzz is absent it
    scores every method with ``difflib.SequenceMatcher.ratio`` —
    deliberately DIFFERENT semantics from the primary token-set
    algebra (order-sensitive, no token dedup). Exposed for parity with
    the reference's fallback path; the engine's dedup stages always
    use the primary scorer."""
    import difflib
    return int(round(100 * difflib.SequenceMatcher(None, a, b).ratio()))


def score(a: str, b: str, method: str = "token_set",
          engine: str = "primary") -> int:
    """``MakerAndCustomIDSimilarity.py:23-32``: primary rapidfuzz-parity
    branch, or ``engine="difflib"`` for the reference's degraded mode
    (which ignores ``method``, exactly as the reference does)."""
    if engine == "difflib":
        return difflib_score(a, b)
    if method == "token_set":
        return int(token_set_ratio(a, b))
    if method == "token_sort":
        return int(token_sort_ratio(a, b))
    if method == "partial":
        return int(partial_ratio(a, b))
    return int(indel_ratio(a, b))


def strings_similar(a: Optional[str], b: Optional[str], *, threshold: int = 90,
                    method: str = "token_set",
                    strip_common_winery_words: bool = False) -> bool:
    if not a or not b:
        return False
    sw = WINERY_WORDS if strip_common_winery_words else None
    na = normalize(a, sw)
    nb = normalize(b, sw)
    if not na or not nb:
        return False
    return score(na, nb, method) >= threshold


def extract_year(s: str) -> Optional[str]:
    m = _YEAR.search(s)
    return m.group(0) if m else None


def is_maker_name_similar(m1: Optional[str], m2: Optional[str], *,
                          threshold: int = 85) -> bool:
    return strings_similar(m1, m2, threshold=threshold,
                           strip_common_winery_words=False)


def is_custom_id_similar(c1: Optional[str], c2: Optional[str], *,
                         threshold: int = 85) -> bool:
    if c1 is None or c2 is None:
        return False
    y1, y2 = extract_year(c1), extract_year(c2)
    if y1 and y2 and y1 != y2:
        return False
    return strings_similar(c1, c2, threshold=threshold,
                           strip_common_winery_words=False)


def is_vintage_similar(v1, v2) -> bool:
    """``similarity_functions/VintageSimilarity.py:12-17`` — either falsy -> False."""
    if not v1 or not v2:
        return False
    return v1 == v2


def is_barcode_similar(b1, b2) -> bool:
    """``similarity_functions/QRCodeSimilarity.py:13-18``."""
    if not b1 or not b2:
        return False
    return b1 == b2
