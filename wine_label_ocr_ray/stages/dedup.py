"""Record-level dedup stages (reference J1/J2/D1/D4 semantics).

- ``decide_against_db``: the scan-and-store decision
  (``ocr_scripts[NOT BEING USED]/scan_and_store.py:122-164``): exact
  canonical-key hit -> ("seen", 100); else fuzzy token_set_ratio over
  maker_norm with vintage blocking (same-vintage candidates preferred,
  +5 bonus capped at 100) and threshold 85. The DB is the small side:
  broadcast once via ``ray.put``, read in every batch (no shuffle).
- ``blob_near_dup_pairs``: D4 geometric near-dup
  (``similarity_functions/BlobSimilarity.py:105-144``) over candidate
  pairs blocked by vintage (the reference's J2 blocking key reused) —
  pairwise scoring only within blocks, never all-to-all.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import fuzzy as F
from ..functions.blobs import blob_similarity


def best_match(db: List[Dict], maker_norm: str, vintage: Optional[str],
               maker_threshold: int = 85):
    """Exact port of ``scan_and_store.best_match`` (:122-164) against a
    list of {maker_norm, vintage, key, id} records."""
    if not db:
        return "not seen", None, 0, "db empty"
    key = f"{maker_norm}|{vintage or ''}"
    for it in db:
        if it.get("key") == key and key != "|":
            return "seen", it, 100, "exact canonical key match"
    cands = db
    if vintage:
        same_vintage = [it for it in db if it.get("vintage") == vintage]
        if same_vintage:
            cands = same_vintage
    best_item, best_score = None, -1
    for it in cands:
        score = F.token_set_ratio(maker_norm, it.get("maker_norm", ""))
        if vintage and it.get("vintage") == vintage:
            score = min(100, score + 5)
        if score > best_score:
            best_score = score
            best_item = it
    if best_score >= maker_threshold and best_item:
        return "seen", best_item, best_score, \
            f"fuzzy maker match >= {maker_threshold}"
    return "not seen", best_item, best_score, "no sufficient match"


class DbIndex:
    """Indexed view of the committed DB preserving ``best_match``
    semantics exactly, built once per actor:

    - exact leg (J1): dict on ``key`` keeping the FIRST occurrence
      (the reference's linear scan returns the first hit) — O(1)
      instead of O(|DB|) per probe.
    - fuzzy leg (J2): vintage-bucketed candidate lists in DB order
      (the reference restricts candidates to the probe's vintage when
      any exist, ``scan_and_store.py:144-148``) — O(|block|) scoring.
      First-max-wins argmax order is preserved because buckets keep
      DB order.
    """

    def __init__(self, db: List[Dict]):
        self.db = db
        self.by_key: Dict[str, Dict] = {}
        self.by_vintage: Dict[str, List[Dict]] = {}
        for it in db:
            k = it.get("key")
            if k is not None and k not in self.by_key:
                self.by_key[k] = it
            v = it.get("vintage")
            if v is not None:
                self.by_vintage.setdefault(v, []).append(it)

    def best(self, maker_norm: str, vintage: Optional[str],
             maker_threshold: int = 85):
        if not self.db:
            return "not seen", None, 0, "db empty"
        key = f"{maker_norm}|{vintage or ''}"
        if key != "|":
            hit = self.by_key.get(key)
            if hit is not None:
                return "seen", hit, 100, "exact canonical key match"
        cands = self.db
        bonus_all = False
        if vintage:
            bucket = self.by_vintage.get(vintage)
            if bucket:
                cands = bucket
                bonus_all = True
        best_item, best_score = None, -1
        for it in cands:
            score = F.token_set_ratio(maker_norm, it.get("maker_norm", ""))
            if bonus_all or (vintage and it.get("vintage") == vintage):
                score = min(100, score + 5)
            if score > best_score:
                best_score = score
                best_item = it
        if best_score >= maker_threshold and best_item:
            return "seen", best_item, best_score, \
                f"fuzzy maker match >= {maker_threshold}"
        return "not seen", best_item, best_score, "no sufficient match"


class DedupDecide:
    """Actor-pool ``map_batches`` stage: the committed DB is fetched
    once per actor from the object store (broadcast small side) and
    indexed once in ``__init__`` (exact-key dict + vintage buckets)."""

    def __init__(self, db_ref, maker_threshold: int = 85):
        import ray
        self.index = DbIndex(ray.get(db_ref))
        self.maker_threshold = maker_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        makers = batch.column("maker_norm").to_pylist()
        vintages = batch.column("vintage_str").to_pylist() \
            if "vintage_str" in batch.schema.names else \
            [str(v) if v is not None else None
             for v in batch.column("vintage").to_pylist()]
        decisions, scores, match_ids, reasons = [], [], [], []
        for mn, vs in zip(makers, vintages):
            decision, item, score, reason = self.index.best(
                mn or "", vs, self.maker_threshold)
            decisions.append(decision)
            scores.append(int(score))
            match_ids.append(item.get("id") if item else None)
            reasons.append(reason)
        return (batch
                .append_column("decision", pa.array(decisions, pa.string()))
                .append_column("score", pa.array(scores, pa.int64()))
                .append_column("match_id", pa.array(match_ids, pa.string()))
                .append_column("reason", pa.array(reasons, pa.string())))


def decide_against_db(records_ds, db_records: List[Dict], *,
                      maker_threshold: int = 85, concurrency: int = 2):
    """records Dataset (maker_norm, vintage[, vintage_str]) -> same +
    decision/score/match_id/reason columns."""
    import ray
    db_ref = ray.put(db_records)
    return records_ds.map_batches(
        DedupDecide,
        fn_constructor_kwargs=dict(db_ref=db_ref,
                                   maker_threshold=maker_threshold),
        batch_format="pyarrow", concurrency=concurrency)


def blob_pairs_in_block(g: pd.DataFrame, *, threshold: float,
                        pair_threshold: float) -> pd.DataFrame:
    """Pairwise blob similarity within one vintage block."""
    rows = g.sort_values("doc_id").to_dict("records")
    blobs = [json.loads(r["blob_json"]) for r in rows]  # parse once, O(n)
    out = {"doc_a": [], "doc_b": [], "blob_score": [], "similar": []}
    for i in range(len(rows)):
        bi = blobs[i]
        for j in range(i + 1, len(rows)):
            bj = blobs[j]
            similar, details = blob_similarity(
                bi, bj, threshold=threshold, pair_threshold=pair_threshold,
                return_details=True)
            if details["score"] > 0.0:
                out["doc_a"].append(rows[i]["doc_id"])
                out["doc_b"].append(rows[j]["doc_id"])
                out["blob_score"].append(round(details["score"], 6))
                out["similar"].append(bool(similar))
    return pd.DataFrame(out) if out["doc_a"] else pd.DataFrame(
        {"doc_a": pd.Series([], dtype="object"),
         "doc_b": pd.Series([], dtype="object"),
         "blob_score": pd.Series([], dtype="float64"),
         "similar": pd.Series([], dtype="bool")})


def blob_near_dup_pairs(records_ds, *, threshold: float = 0.55,
                        pair_threshold: float = 0.22,
                        max_block_rows: Optional[int] = 512):
    """records Dataset with (doc_id, vintage, blob) -> candidate pairs
    scored by D4 within vintage blocks. Records without vintage or
    without blobs are excluded (empty sides always decide False,
    ``BlobSimilarity.py:123-127``).

    Skew handling (hot blocking keys): a vintage block with n rows does
    O(n^2) pairwise work in ONE map_groups task. Blocks larger than
    ``max_block_rows`` are salted into S = ceil(n / cap) sub-blocks by
    doc-id hash, and every row is replicated into each (sub_a, sub_b)
    block-pair it participates in — the exact same pair set, spread
    over S*(S+1)/2 tasks. Needs the per-vintage counts first (a tiny
    grouped count, broadcast to the salting stage).
    """
    import math

    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    def prep(t: pa.Table) -> pa.Table:
        blob = t["blob"]
        if isinstance(blob, pa.ChunkedArray):
            blob = blob.combine_chunks()
        counts = pc.struct_field(blob, "blob_count")
        keep = pc.and_(pc.greater(counts, 0),
                       pc.is_valid(t["vintage"]))
        t2 = t.filter(keep)
        blob2 = t2["blob"]
        if isinstance(blob2, pa.ChunkedArray):
            blob2 = blob2.combine_chunks()
        payload = [json.dumps(b) for b in blob2.to_pylist()]
        return pa.table({"doc_id": t2["doc_id"],
                         "vintage": t2["vintage"],
                         "blob_json": pa.array(payload, pa.string())})

    prepped = records_ds.map_batches(prep, batch_format="pyarrow")

    if max_block_rows is not None:
        # tiny grouped count -> S per vintage, broadcast
        sizes = (prepped.groupby("vintage")
                 .aggregate(Count(alias_name="n")).to_pandas())
        splits = {int(r.vintage): max(1, math.ceil(r.n / max_block_rows))
                  for r in sizes.itertuples()}
        if any(s > 1 for s in splits.values()):
            splits_ref = ray.put(splits)

            def salt(df: pd.DataFrame) -> pd.DataFrame:
                import zlib
                sp = ray.get(splits_ref)
                out = []
                for r in df.itertuples(index=False):
                    s = sp.get(int(r.vintage), 1)
                    my = zlib.crc32(str(r.doc_id).encode()) % s
                    for other in range(s):
                        a, b = min(my, other), max(my, other)
                        out.append((r.doc_id, r.vintage, r.blob_json,
                                    a * s + b, my, a == b))
                return pd.DataFrame(out, columns=["doc_id", "vintage",
                                                  "blob_json", "sub",
                                                  "my_sub", "diag"])

            import functools
            fn = functools.partial(_block_pair_fn, threshold=threshold,
                                   pair_threshold=pair_threshold)
            return (prepped.map_batches(salt, batch_format="pandas")
                    .groupby(["vintage", "sub"])
                    .map_groups(fn, batch_format="pandas"))

    import functools
    fn = functools.partial(blob_pairs_in_block, threshold=threshold,
                           pair_threshold=pair_threshold)
    return (prepped.groupby("vintage")
                   .map_groups(fn, batch_format="pandas"))


def _block_pair_fn(g: pd.DataFrame, *, threshold: float,
                   pair_threshold: float) -> pd.DataFrame:
    """Pairwise scoring within a salted (vintage, sub-block-pair)
    group. A diagonal group (a, a) owns all within-a pairs; an
    off-diagonal group (a, b) owns only CROSS pairs (one row of each
    sub-block) — same-sub pairs there belong to the diagonal group."""
    rows = g.sort_values("doc_id").to_dict("records")
    blobs = [json.loads(r["blob_json"]) for r in rows]
    diag = bool(rows[0]["diag"]) if rows else True
    out = {"doc_a": [], "doc_b": [], "blob_score": [], "similar": []}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if not diag and rows[i]["my_sub"] == rows[j]["my_sub"]:
                continue
            similar, details = blob_similarity(
                blobs[i], blobs[j], threshold=threshold,
                pair_threshold=pair_threshold, return_details=True)
            if details["score"] > 0.0:
                out["doc_a"].append(rows[i]["doc_id"])
                out["doc_b"].append(rows[j]["doc_id"])
                out["blob_score"].append(round(details["score"], 6))
                out["similar"].append(bool(similar))
    return pd.DataFrame(out) if out["doc_a"] else pd.DataFrame(
        {"doc_a": pd.Series([], dtype="object"),
         "doc_b": pd.Series([], dtype="object"),
         "blob_score": pd.Series([], dtype="float64"),
         "similar": pd.Series([], dtype="bool")})
