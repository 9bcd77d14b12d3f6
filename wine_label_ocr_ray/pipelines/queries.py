"""Query registry: name -> callable(sf_dir) and name -> DuckDB oracle
SQL (the driver's correctness gate). Queries without an oracle entry
are non-SQL-expressible (flagship extraction, sketches) and get the
driver's rows-only check."""

from __future__ import annotations

import os

import pandas as pd

from . import queries_docs as D
from . import queries_rel as R


def flagship_extract(sf_dir: str):
    """Flagship interleaved-document extraction over a corpus derived
    deterministically from this sf_dir's documents table (scalar record
    columns only; span/blob equality is covered by the pytest oracle
    suite)."""
    from ..pipelines.extract import build_extract_pipeline
    from ..synth import derive_corpus_from_documents

    tag = os.path.basename(os.path.normpath(sf_dir))
    corpus = derive_corpus_from_documents(
        os.path.join(sf_dir, "documents.parquet"),
        f"/tmp/wlor_corpus_{tag}", seed=42)
    ds = build_extract_pipeline(corpus)
    return ds.select_columns(["doc_id", "custom_id", "maker_name",
                              "maker_norm", "vintage", "barcode", "key",
                              "record_id", "valid"])


def record_dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact record-level dedup over flagship output: first-wins per
    canonical key among valid records (reference D1 semantics,
    scan_and_store.py:234-235 made deterministic)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    ds = flagship_extract(sf_dir)
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["valid"], True)),
        batch_format="pyarrow")
    return (ds.groupby("key")
              .aggregate(Min("doc_id", alias_name="keep_doc_id"),
                         Count(alias_name="n_copies"))
              .to_pandas())


QUERIES = {
    # relational / TPC-H-shaped (SURVEY §2.3, §2.5-2.7 generalized)
    "q1_pricing_summary": R.q1_pricing_summary,
    "q6_forecast_revenue": R.q6_forecast_revenue,
    "top_orders": R.top_orders,
    "distinct_segments": R.distinct_segments,
    "count_distinct_cust": R.count_distinct_cust,
    "union_priority_counts": R.union_priority_counts,
    "q3_shipping_priority": R.q3_shipping_priority,
    "q5_region_revenue": R.q5_region_revenue,
    # stream-shaped (SURVEY §2.8 re-expressed batch)
    "events_hourly": R.events_hourly,
    "events_sessionize": R.events_sessionize,
    "events_asof_click": R.events_asof_click,
    # documents: text analysis / fingerprints / dedup
    "doc_stats": D.doc_stats,
    "doc_quality": D.doc_quality,
    "doc_lang_id": D.doc_lang_id,
    "dedup_exact": D.dedup_exact,
    "ngram_jaccard_pairs": D.ngram_jaccard_pairs,
    # embeddings: similarity search / centroids / near-dup
    "embedding_norms": D.embedding_norms,
    "embedding_centroids": D.embedding_centroids,
    "knn_cosine_topk": D.knn_cosine_topk,
    "cosine_dup_pairs": D.cosine_dup_pairs,
    # rows-only (non-SQL-expressible)
    "minhash_lsh_pairs": D.minhash_lsh_pairs,
    "simhash_fingerprints": D.simhash_fingerprints,
    "flagship_extract": flagship_extract,
    "record_dedup_exact": record_dedup_exact,
}

ORACLE_SQL = {
    "q1_pricing_summary": R.Q1_SQL,
    "q6_forecast_revenue": R.Q6_SQL,
    "top_orders": R.TOP_ORDERS_SQL,
    "distinct_segments": R.DISTINCT_SEGMENTS_SQL,
    "count_distinct_cust": R.COUNT_DISTINCT_SQL,
    "union_priority_counts": R.UNION_PRIORITY_SQL,
    "q3_shipping_priority": R.Q3_SQL,
    "q5_region_revenue": R.Q5_SQL,
    "events_hourly": R.EVENTS_HOURLY_SQL,
    "events_sessionize": R.EVENTS_SESSIONIZE_SQL,
    "events_asof_click": R.EVENTS_ASOF_SQL,
    "doc_stats": D.DOC_STATS_SQL,
    "doc_quality": D.DOC_QUALITY_SQL,
    "doc_lang_id": D.DOC_LANG_ID_SQL,
    "dedup_exact": D.DEDUP_EXACT_SQL,
    "ngram_jaccard_pairs": D.NGRAM_JACCARD_SQL,
    "embedding_norms": D.EMBEDDING_NORMS_SQL,
    "embedding_centroids": D.EMBEDDING_CENTROIDS_SQL,
    "knn_cosine_topk": D.KNN_SQL,
    "cosine_dup_pairs": D.COSINE_DUP_SQL,
}
