"""Documents + embeddings queries: the training-data operator suite
(text analysis, fingerprinting, exact/near dedup, similarity search).

Determinism contract with the DuckDB oracles: integer-derived ratios
are emitted as raw doubles (same IEEE division on both sides is
bit-identical); only cross-batch float REDUCTIONS (cosine sums,
centroid means) are rounded (6dp) because summation order differs.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions import textstats as TS
from ._qutil import read_table

_STOPWORDS_SQL = "[" + ", ".join(f"'{w}'" for w in sorted(TS.STOPWORDS)) + "]"

# ----------------------------------------------------------- doc stats

def doc_stats(sf_dir: str) -> pd.DataFrame:
    """Per-document token/char statistics, fully vectorized Arrow."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        txt = t["text"]
        n_tokens = pc.count_substring_regex(txt, pattern=r"\S+")
        n_bpe = pc.count_substring_regex(
            txt, pattern=r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
        n_alnum = pc.count_substring_regex(txt, pattern=r"[A-Za-z0-9]")
        nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
        na = n_alnum.to_numpy(zero_copy_only=False).astype(np.float64)
        mean_len = np.where(nt > 0, na / np.maximum(nt, 1), 0.0)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n_tokens,
                         "n_tokens_bpe": n_bpe, "n_alnum": n_alnum,
                         "mean_alnum_per_token": pa.array(mean_len)})

    return ds.map_batches(stats, batch_format="pyarrow").to_pandas()


DOC_STATS_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))
           AS n_tokens_bpe,
       length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_alnum,
       CASE WHEN len(regexp_extract_all(text, '\S+')) > 0 THEN
         length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE
           / len(regexp_extract_all(text, '\S+'))
       ELSE 0.0 END AS mean_alnum_per_token
FROM documents
"""

# -------------------------------------------------------- quality score

def doc_quality(sf_dir: str) -> pd.DataFrame:
    """Quality features + filter (stopword ratio, token count band) —
    the boilerplate-quality gate of a training-data pipeline."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def qual(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split()
        n = toks.str.len().astype("int64")
        stops = toks.map(lambda ws: sum(w in TS.STOPWORDS for w in ws))
        out = pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": n,
            "n_stop": stops.astype("int64"),
            "stop_ratio": np.where(n > 0, stops / n.clip(lower=1), 0.0),
        })
        return out[(out.n_tokens >= 20) & (out.stop_ratio <= 0.3)]

    return ds.map_batches(qual, batch_format="pandas").to_pandas()


DOC_QUALITY_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents)
SELECT doc_id, len(toks) AS n_tokens,
       len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x)))
           AS n_stop,
       CASE WHEN len(toks) > 0 THEN
         len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x)))::DOUBLE
           / len(toks) ELSE 0.0 END AS stop_ratio
FROM t
WHERE len(toks) >= 20
  AND (len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x)))::DOUBLE
       / len(toks)) <= 0.3
"""

# ------------------------------------------------------------ lang id

def doc_lang_id(sf_dir: str) -> pd.DataFrame:
    """Marker-word language-ID heuristic (argmax, alphabetical
    tie-break, 'und' when no marker hits)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def lang(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "pred_lang": df["text"].map(TS.lang_id)})

    return ds.map_batches(lang, batch_format="pandas").to_pandas()


def _lang_id_sql() -> str:
    score_cols = []
    for lg in sorted(TS.LANG_MARKERS):
        markers = "[" + ", ".join(f"'{w}'" for w in TS.LANG_MARKERS[lg]) + "]"
        score_cols.append(
            f"len(list_filter({markers}, x -> list_contains(toks, x))) AS s_{lg}")
    langs = sorted(TS.LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = "CASE WHEN " + greatest + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{lg} = {greatest} THEN '{lg}'" for lg in langs) + " END"
    return rf"""
WITH t AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks
  FROM documents),
s AS (SELECT doc_id, {", ".join(score_cols)} FROM t)
SELECT doc_id, {case} AS pred_lang FROM s
"""


DOC_LANG_ID_SQL = _lang_id_sql()

# --------------------------------------------------------- exact dedup

def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: content-hash -> hash-partitioned first-wins
    (keep the minimum doc_id per identical text)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def h(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "text_hash": df["text"].map(
                lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()),
            "doc_id": df["doc_id"]})

    from ray.data.aggregate import Min
    out = (ds.map_batches(h, batch_format="pandas")
             .groupby("text_hash")
             .aggregate(Min("doc_id", alias_name="keep_doc_id"),
                        Count(alias_name="n_copies"))
             .to_pandas())
    return out


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""

# ----------------------------------------------------- n-gram jaccard

JACCARD_THRESHOLD = 0.2


def _shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, shingle, n_shingles) rows — distinct word-3-gram
    shingles per doc, sizes carried along to avoid a later join."""
    ids, shs, ns = [], [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = text.lower().strip().split()
        if len(toks) <= 3:
            sh = {" ".join(toks)}
        else:
            sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        for s in sh:
            ids.append(doc_id)
            shs.append(s)
            ns.append(len(sh))
    return pd.DataFrame({"doc_id": ids, "shingle": shs, "n": ns})


def ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard >= 0.2. Pattern:
    shingle-explode on both sides -> hash self-join on the shingle
    (vectorized Arrow join, no per-group Python) -> pair-count
    aggregation = intersection size -> Jaccard filter. (The LSH variant
    minhash_lsh_pairs is the sub-quadratic scale path.)"""
    from ._qutil import join_partitions
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sh_a = (ds.map_batches(_shingle_rows, batch_format="pandas")
              .map_batches(lambda t: t.rename_columns(
                  ["doc_a", "shingle", "na"]), batch_format="pyarrow"))
    ds_b = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sh_b = (ds_b.map_batches(_shingle_rows, batch_format="pandas")
                .map_batches(lambda t: t.rename_columns(
                    ["doc_b", "shingle", "nb"]), batch_format="pyarrow"))
    joined = sh_a.join(sh_b, join_type="inner",
                       num_partitions=join_partitions(), on=("shingle",))
    joined = joined.map_batches(
        lambda t: t.filter(pc.less(t["doc_a"], t["doc_b"])),
        batch_format="pyarrow")
    out = (joined.groupby(["doc_a", "doc_b", "na", "nb"])
                 .aggregate(Count(alias_name="inter"))
                 .to_pandas())
    jac = out["inter"] / (out["na"] + out["nb"] - out["inter"])
    out = out.assign(jaccard=jac)[jac >= JACCARD_THRESHOLD]
    return out[["doc_a", "doc_b", "inter", "jaccard"]].reset_index(drop=True)


NGRAM_JACCARD_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS arr
  FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(arr) <= 3
           THEN [array_to_string(arr, ' ')]
           ELSE list_transform(generate_series(1, len(arr) - 2),
                               i -> array_to_string(arr[i:i+2], ' ')) END))
             AS s
  FROM toks),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, inter,
       inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= {JACCARD_THRESHOLD}
"""

# -------------------------------------------------------- embeddings

def embedding_norms(sf_dir: str) -> pd.DataFrame:
    """Per-vector L2 norm (vectorized fixed-width list -> numpy)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norms(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(t), -1)
        return pa.table({"vec_id": t["vec_id"],
                         "l2_norm": np.round(np.sqrt((m * m).sum(axis=1)), 6)})

    return ds.map_batches(norms, batch_format="pyarrow").to_pandas()


EMBEDDING_NORMS_SQL = """
SELECT vec_id,
       round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
                                                x -> x * x), 'sum')), 6)
           AS l2_norm
FROM embeddings
"""


def _centroid_partials(labels: np.ndarray, m: np.ndarray,
                       name: str) -> pa.Table:
    """Per-batch partial centroid table: (label, dim 1-based, sum,
    count) rows via np.unique + np.add.at — shared by
    embedding_centroids and embedding_lang_centroids so the partial
    algebra (dim convention, casts) has one home."""
    labs, inv = np.unique(labels, return_inverse=True)
    sums = np.zeros((len(labs), m.shape[1]), dtype=np.float64)
    np.add.at(sums, inv, m)
    counts = np.bincount(inv, minlength=len(labs))
    d = m.shape[1]
    return pa.table({
        name: pa.array(np.repeat(labs, d)),
        "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                len(labs))),
        "s": pa.array(sums.ravel()),
        "c": pa.array(np.repeat(counts, d).astype(np.int64))})


def embedding_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label centroid, one row per (label, dim). Pattern: per-batch
    PARTIAL sums (vectorized) -> tiny grouped combine — the
    pre-aggregation shape that avoids shuffling raw vectors."""
    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(len(t), -1)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        return _centroid_partials(labels, m, "label")

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["label", "dim"])
             .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
             .to_pandas())
    from ._qutil import ensure_columns
    out = ensure_columns(out, ["label", "dim", "s", "c"])
    out["avg_val"] = np.round(out["s"] / out["c"], 6)
    return out[["label", "dim", "avg_val"]]


EMBEDDING_CENTROIDS_SQL = """
SELECT label, dim, round(avg(e), 6) AS avg_val
FROM (SELECT label, unnest(embedding::DOUBLE[]) AS e,
             unnest(generate_series(1, len(embedding))) AS dim
      FROM embeddings)
GROUP BY 1, 2
"""


KNN_K = 5
KNN_NUM_QUERIES = 10


def knn_cosine_topk(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-k similarity search: the broadcast-query
    pattern (query matrix ray.put once; per-batch numpy matmul emits
    per-batch partial top-k; tiny grouped merge finalizes)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                      filter=(pc.field("vec_id") < KNN_NUM_QUERIES))
           .to_pandas())
    if qdf.empty:
        from ._qutil import empty_frame
        return empty_frame(query_id="int64", neighbor_id="int64",
                           score="float64", rank="int64")
    qdf = qdf.sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy()
    q_ref = ray.put((qids, Q))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(q_ref)
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        V = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(len(t), -1)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = vids >= KNN_NUM_QUERIES
        V, vids = V[keep], vids[keep]
        if len(vids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        num = Q_ @ V.T
        den = (np.linalg.norm(Q_, axis=1)[:, None] *
               np.linalg.norm(V, axis=1)[None, :])
        S = np.round(num / den, 6)
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        k = min(KNN_K, S.shape[1])
        for qi in range(S.shape[0]):
            idx = np.lexsort((vids, -S[qi]))[:k]
            rows["query_id"].extend([int(qids_[qi])] * len(idx))
            rows["neighbor_id"].extend(int(v) for v in vids[idx])
            rows["score"].extend(float(s) for s in S[qi][idx])
        return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                         "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
                         "score": pa.array(rows["score"], pa.float64())})

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"],
                          ascending=[False, True]).head(KNN_K)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.map_batches(partial_topk, batch_format="pyarrow")
              .groupby("query_id")
              .map_groups(final_topk, batch_format="pandas")
              .to_pandas())


KNN_SQL = f"""
SELECT query_id, neighbor_id, score, rnk AS rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS score,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                 c.embedding::DOUBLE[]), 6)
                    DESC, c.vec_id) AS rnk
  FROM (SELECT * FROM embeddings WHERE vec_id < {KNN_NUM_QUERIES}) q,
       (SELECT * FROM embeddings WHERE vec_id >= {KNN_NUM_QUERIES}) c)
WHERE rnk <= {KNN_K}
"""


COSINE_DUP_THRESHOLD = 0.45


def cosine_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Embedding near-dup pairs (cosine >= threshold) via block-wise
    matmul against a broadcast matrix. O(n^2) baseline — the LSH/IVF
    bucketing in minhash/knn is the documented scale path."""
    from ._qutil import empty_frame
    full = read_table(sf_dir, "embeddings",
                      columns=["vec_id", "embedding"]).to_pandas()
    if full.empty:
        return empty_frame(vec_a="int64", vec_b="int64",
                           cosine="float64")
    M = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    ids = full["vec_id"].to_numpy()
    m_ref = ray.put((ids, M / np.linalg.norm(M, axis=1, keepdims=True)))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def block(t: pa.Table) -> pa.Table:
        all_ids, Mn = ray.get(m_ref)
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        V = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(len(t), -1)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        S = np.round(V @ Mn.T, 6)
        bi, bj = np.nonzero(S >= COSINE_DUP_THRESHOLD)
        a = vids[bi]
        b = all_ids[bj]
        keep = a < b
        return pa.table({"vec_a": pa.array(a[keep], pa.int64()),
                         "vec_b": pa.array(b[keep], pa.int64()),
                         "cosine": pa.array(S[bi, bj][keep], pa.float64())})

    return ds.map_batches(block, batch_format="pyarrow").to_pandas()


COSINE_DUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 6)
      >= {COSINE_DUP_THRESHOLD}
"""

# ------------------------------------------- rows-only (no SQL oracle)

_CLSH_TABLES = 16          # OR-amplification: recall ~1-(1-p^bits)^tables
_CLSH_BITS = 4             # AND-amplification per table; at production
                           # scale raise bits with log2(n) so buckets
                           # stay O(n / 2^bits) and the pair count
                           # sub-quadratic (the knob, not the design)
_CLSH_PLANES = np.random.RandomState(2024).randn(_CLSH_TABLES,
                                                 _CLSH_BITS, 64)


def cosine_lsh_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Bucketed embedding near-dup PAIRS — the sub-quadratic scale path
    next to the all-pairs baseline ``cosine_dup_pairs``: 16 independent
    4-bit random-hyperplane tables (per-batch vectorized signatures),
    groupby(table, bucket) emits candidate pairs, distributed dedup,
    then exact-cosine verification via two hash joins back to the
    embeddings table (vectors are never all-broadcast and never
    all-pairs scored). Rows-only; pytest asserts pairs are a subset of
    the exact result with recall >= 0.85."""
    from ray.data.aggregate import Count as _Count

    from ._qutil import join_partitions
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def sig_rows(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        V = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(len(t), -1)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        ids_out, tables_out, buckets_out = [], [], []
        for ti in range(_CLSH_TABLES):
            bits = (V @ _CLSH_PLANES[ti].T) > 0
            bucket = (bits.astype(np.int64) <<
                      np.arange(_CLSH_BITS, dtype=np.int64)).sum(axis=1)
            ids_out.append(vids)
            tables_out.append(np.full(len(vids), ti, dtype=np.int64))
            buckets_out.append(bucket)
        return pa.table({
            "vec_id": pa.array(np.concatenate(ids_out), pa.int64()),
            "table": pa.array(np.concatenate(tables_out), pa.int64()),
            "bucket": pa.array(np.concatenate(buckets_out), pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["vec_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64")})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"vec_a": ids[ia], "vec_b": ids[ib]})

    cand = (ds.map_batches(sig_rows, batch_format="pyarrow")
              .groupby(["table", "bucket"])
              .map_groups(pairs, batch_format="pandas")
              .groupby(["vec_a", "vec_b"])
              .aggregate(_Count(alias_name="_ntables")))

    def tag(name: str):
        def fn(t: pa.Table) -> pa.Table:
            emb = t["embedding"]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            V = emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64).reshape(len(t), -1)
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            # packed float64 bytes: Arrow hash joins reject list<double>
            # payload columns, binary passes through fine
            payload = pa.array([row.tobytes() for row in V], pa.binary())
            return pa.table({name: t["vec_id"], f"_n_{name}": payload})
        return fn

    emb_a = read_table(sf_dir, "embeddings",
                       columns=["vec_id", "embedding"]).map_batches(
        tag("vec_a"), batch_format="pyarrow")
    emb_b = read_table(sf_dir, "embeddings",
                       columns=["vec_id", "embedding"]).map_batches(
        tag("vec_b"), batch_format="pyarrow")
    j = (cand.join(emb_a, join_type="inner",
                   num_partitions=join_partitions(), on=("vec_a",))
             .join(emb_b, join_type="inner",
                   num_partitions=join_partitions(), on=("vec_b",)))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        A = np.stack([np.frombuffer(b, dtype=np.float64)
                      for b in t["_n_vec_a"].to_pylist()])
        B = np.stack([np.frombuffer(b, dtype=np.float64)
                      for b in t["_n_vec_b"].to_pylist()])
        cos = np.round((A * B).sum(axis=1), 6)
        keep = cos >= COSINE_DUP_THRESHOLD
        return pa.table({
            "vec_a": pc.cast(t["vec_a"], pa.int64()).filter(pa.array(keep)),
            "vec_b": pc.cast(t["vec_b"], pa.int64()).filter(pa.array(keep)),
            "cosine": pa.array(cos[keep], pa.float64())})

    out = j.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


# LSH buckets are grouped by (band, bucket % SALT), not (band, bucket):
# a raw bucket key has ~n distinct values, and sliced map_groups pays
# ~200us per group — 1e5 tiny groups turn a seconds-long job into
# minutes. The salted key caps the group COUNT at bands*SALT while the
# pandas sub-groupby inside each group keeps exact bucket semantics;
# group SIZE stays bounded at ~n/SALT rows per band.
_BUCKET_SALT = 64


def _bucket_pairs(g: pd.DataFrame, id_col: str = "doc_id",
                  a_col: str = "doc_a", b_col: str = "doc_b",
                  extra_col: Optional[str] = None) -> pd.DataFrame:
    """All same-bucket pairs within one (band, bucket_mod) group via a
    local pandas sub-groupby over the exact bucket key. ``extra_col``
    optionally carries a per-row value onto both pair sides (as
    <extra>_a / <extra>_b)."""
    out_a, out_b, out_xa, out_xb = [], [], [], []
    for _, sub in g.groupby("bucket", sort=False):
        if len(sub) < 2:
            continue
        order = np.argsort(sub[id_col].to_numpy(), kind="stable")
        ids = sub[id_col].to_numpy()[order]
        ia, ib = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
        if extra_col is not None:
            x = sub[extra_col].to_numpy()[order]
            out_xa.append(x[ia])
            out_xb.append(x[ib])
    if not out_a:
        cols = {a_col: pd.Series([], dtype="int64"),
                b_col: pd.Series([], dtype="int64")}
        if extra_col is not None:
            cols[f"{extra_col}_a"] = pd.Series([], dtype="int64")
            cols[f"{extra_col}_b"] = pd.Series([], dtype="int64")
        return pd.DataFrame(cols)
    cols = {a_col: np.concatenate(out_a), b_col: np.concatenate(out_b)}
    if extra_col is not None:
        cols[f"{extra_col}_a"] = np.concatenate(out_xa)
        cols[f"{extra_col}_b"] = np.concatenate(out_xb)
    return pd.DataFrame(cols)


def minhash_lsh_pairs(sf_dir: str, *,
                      isin_prune_max: int = 100_000,
                      driver_verify_max: int = 2_000) -> pd.DataFrame:
    """MinHash(128)+LSH(16 bands) candidate pairs, verified by exact
    Jaccard >= 0.2 — the sub-quadratic near-dup path. No SQL oracle
    (sketch-based); ngram_jaccard_pairs is the exact baseline and the
    pytest suite asserts this query's pairs are a subset of it.

    Verification is volume-routed (all three paths produce identical
    pairs — pytest-asserted):
    - ``npairs <= driver_verify_max``: the bounded pair table and the
      candidate docs' shingle rows (computed distributed, pruned by a
      pushed-down isin scan) are collected and intersected driver-side
      — 2 dataset executions, no hash joins, which at near-dup-sparse
      candidate counts saves several seconds of per-join
      aggregator-actor ramp and barrier latency.
    - else if ``2*npairs <= isin_prune_max``: distributed
      candidate x shingle hash-join verify over an isin-pruned scan.
    - else: same join verify with a semi-join prune — no driver-side
      id list at all (the 100-TB form)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    NUM_PERMS, NUM_BANDS = 128, 16

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        # batched sketch: one flat shingle-hash pass + one numpy
        # signature/banding computation for the WHOLE batch (identical
        # signatures to per-doc minhash_signature; bucket ids are
        # grouping-internal, see band_buckets_mix)
        sh_lists = []
        for text in df["text"]:
            toks = text.lower().strip().split()
            if len(toks) <= 3:
                sh_lists.append([" ".join(toks)])
            else:
                sh_lists.append(sorted(
                    {" ".join(toks[i:i + 3])
                     for i in range(len(toks) - 2)}))
        offsets = np.zeros(len(sh_lists) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in sh_lists], out=offsets[1:])
        hashes = TS.stable_hashes64([s for sh in sh_lists for s in sh])
        sigs = TS.minhash_signatures_batch(hashes, offsets, NUM_PERMS)
        buckets = TS.band_buckets_mix(sigs, NUM_BANDS)
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), NUM_BANDS),
            "band": np.tile(np.arange(NUM_BANDS, dtype=np.int64),
                            len(sh_lists)),
            "bucket": buckets.reshape(-1).view(np.int64)})

    from ._qutil import join_partitions
    cand = (ds.map_batches(sig_rows, batch_format="pandas")
              .map_batches(lambda df: df.assign(
                  bucket_mod=df["bucket"].to_numpy() % _BUCKET_SALT),
                  batch_format="pandas")
              .groupby(["band", "bucket_mod"])
              .map_groups(_bucket_pairs, batch_format="pandas"))
    # distributed dedup of band-duplicate candidates (a pair colliding
    # in k bands appears k times)
    # small pair table; materialize so the id-set probe and the verify
    # join don't re-execute the signature pipeline
    cand = (cand.groupby(["doc_a", "doc_b"])
                .aggregate(Count(alias_name="_nbands")).materialize())

    # distributed verify: join candidates against the shingle dataset
    # on each side; the per-pair matching-shingle count IS the exact
    # intersection size (no driver-side text fetch, no per-pair
    # Python). Pruning the shingle explode to candidate docs is
    # threshold-gated: a SMALL candidate set becomes a pushed-down
    # isin read predicate (row-group pruning at the scan — the fastest
    # form, bounded driver footprint); a LARGE one stays distributed
    # as a semi-join against the candidate-id Dataset, so no
    # multi-million-value predicate is ever built on the driver
    # (round-2 verdict #7).
    npairs = cand.count()
    if npairs == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    if npairs <= driver_verify_max:
        cand_df = cand.to_pandas()
        needed = sorted({int(v) for v in cand_df["doc_a"]} |
                        {int(v) for v in cand_df["doc_b"]})
        sh_tbl = (read_table(sf_dir, "documents",
                             columns=["doc_id", "text"],
                             filter=pc.field("doc_id").isin(needed))
                  .map_batches(_shingle_rows, batch_format="pandas")
                  .to_pandas())
        sets = {d: set(g) for d, g in
                sh_tbl.groupby("doc_id")["shingle"]}
        rows_a, rows_b, rows_j = [], [], []
        for a, b in zip(cand_df["doc_a"], cand_df["doc_b"]):
            A, B = sets[a], sets[b]
            inter = len(A & B)
            jac = inter / (len(A) + len(B) - inter)
            if jac >= JACCARD_THRESHOLD:
                rows_a.append(int(a)); rows_b.append(int(b))
                rows_j.append(jac)
        out = pd.DataFrame({
            "doc_a": pd.Series(rows_a, dtype="int64"),
            "doc_b": pd.Series(rows_b, dtype="int64"),
            "jaccard": pd.Series(rows_j, dtype="float64")})
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    if 2 * npairs <= isin_prune_max:
        cand_df = cand.select_columns(["doc_a", "doc_b"]).to_pandas()
        needed = sorted({int(v) for v in cand_df["doc_a"]} |
                        {int(v) for v in cand_df["doc_b"]})
        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                          filter=pc.field("doc_id").isin(needed))
    else:
        ids = (cand.map_batches(
                   lambda t: pa.table({"doc_id": pa.concat_arrays(
                       [pc.cast(t["doc_a"], pa.int64()).combine_chunks(),
                        pc.cast(t["doc_b"], pa.int64()).combine_chunks()]
                   )}), batch_format="pyarrow")
               .groupby("doc_id").aggregate(Count(alias_name="_n")))
        docs = (read_table(sf_dir, "documents",
                           columns=["doc_id", "text"])
                .join(ids, join_type="inner",
                      num_partitions=max(2, min(join_partitions(),
                                                npairs // 50000 + 2)),
                      on=("doc_id",))
                .drop_columns(["_n"]))
    sh = (docs.map_batches(_shingle_rows, batch_format="pandas")
          .materialize())
    sh_a = sh.map_batches(lambda t: t.rename_columns(
        ["doc_a", "shingle", "na"]), batch_format="pyarrow")
    sh_b = sh.map_batches(lambda t: t.rename_columns(
        ["doc_b", "shingle", "nb"]), batch_format="pyarrow")
    # verify-join parallelism sized to the CANDIDATE volume, not the
    # cluster: each hash-join partition spawns an aggregator actor
    # with seconds of ramp, which dominates when candidates are few;
    # scales back up with the candidate count at production volume
    shingle_rows = sh.count()
    nparts = max(2, min(join_partitions(), shingle_rows // 20000 + 2))
    j1 = cand.join(sh_a, join_type="inner",
                   num_partitions=nparts, on=("doc_a",))
    j2 = j1.join(sh_b, join_type="inner",
                 num_partitions=nparts,
                 on=("doc_b", "shingle"), right_on=("doc_b", "shingle"))
    out = (j2.groupby(["doc_a", "doc_b", "na", "nb"])
             .aggregate(Count(alias_name="inter"))
             .to_pandas())
    if out.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    jac = out["inter"] / (out["na"] + out["nb"] - out["inter"])
    out = out.assign(jaccard=jac)[jac >= JACCARD_THRESHOLD]
    return (out[["doc_a", "doc_b", "jaccard"]]
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


_LSH_NBITS = 6
_LSH_PLANES = np.random.RandomState(123).randn(_LSH_NBITS, 64)


def _lsh_bucket(V: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH bucket ids for rows of V."""
    bits = (V @ _LSH_PLANES.T) > 0
    return (bits.astype(np.uint32) <<
            np.arange(_LSH_NBITS, dtype=np.uint32)).sum(axis=1)


def knn_lsh_topk(sf_dir: str) -> pd.DataFrame:
    """LSH-bucketed approximate top-k cosine search: candidates limited
    to vectors whose 6-bit hyperplane signature is within Hamming
    distance 2 of the query's — the sub-linear scale path next to the
    brute-force baseline (knn_cosine_topk). Rows-only; pytest checks
    recall against the exact result."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                      filter=(pc.field("vec_id") < KNN_NUM_QUERIES))
           .to_pandas())
    if qdf.empty:
        from ._qutil import empty_frame
        return empty_frame(query_id="int64", neighbor_id="int64",
                           score="float64", rank="int64")
    qdf = qdf.sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy()
    qb = _lsh_bucket(Q)
    # allowed buckets per query (exact + hamming<=2 neighborhood) as a
    # dense (nq, 2^bits) boolean table: membership per batch is then a
    # single fancy-index ``allowed[qi, vb]`` instead of a per-query
    # Python np.fromiter scan (round-2 verdict #10)
    allowed = np.zeros((len(qids), 1 << _LSH_NBITS), dtype=bool)
    for qi, b in enumerate(qb):
        near = {int(b)}
        near |= {int(b) ^ (1 << i) for i in range(_LSH_NBITS)}
        near |= {int(b) ^ (1 << i) ^ (1 << j)
                 for i in range(_LSH_NBITS) for j in range(i + 1, _LSH_NBITS)}
        allowed[qi, sorted(near)] = True
    q_ref = ray.put((qids, Q, allowed))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, Q_, allowed_ = ray.get(q_ref)
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        V = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(len(t), -1)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = vids >= KNN_NUM_QUERIES
        V, vids = V[keep], vids[keep]
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        if len(vids):
            vb = _lsh_bucket(V)
            vnorm = np.linalg.norm(V, axis=1)
            for qi in range(len(qids_)):
                cand = allowed_[qi, vb]
                if not cand.any():
                    continue
                Vc, vc, nc = V[cand], vids[cand], vnorm[cand]
                s = np.round((Vc @ Q_[qi]) /
                             (np.linalg.norm(Q_[qi]) * nc), 6)
                idx = np.lexsort((vc, -s))[:KNN_K]
                rows["query_id"].extend([int(qids_[qi])] * len(idx))
                rows["neighbor_id"].extend(int(v) for v in vc[idx])
                rows["score"].extend(float(x) for x in s[idx])
        return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                         "neighbor_id": pa.array(rows["neighbor_id"],
                                                 pa.int64()),
                         "score": pa.array(rows["score"], pa.float64())})

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"],
                          ascending=[False, True]).head(KNN_K)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.map_batches(partial_topk, batch_format="pyarrow")
              .groupby("query_id")
              .map_groups(final_topk, batch_format="pandas")
              .to_pandas())


_IVF_NLIST = 16          # coarse centroids; production: ~sqrt(n)
_IVF_NPROBE = 4          # centroid lists probed per query
_IVF_SAMPLE = 2048       # driver-side training sample (bounded)
_IVF_ITERS = 8


def _ivf_train(sample: np.ndarray, nlist: int, iters: int,
               seed: int = 7) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a bounded sample (the
    IVF coarse quantizer; at production scale the sample stays
    driver-bounded while assignment is distributed)."""
    rng = np.random.RandomState(seed)
    C = sample[rng.choice(len(sample), size=nlist, replace=False)].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(nlist):
            sel = sample[assign == c]
            if len(sel):
                C[c] = sel.mean(axis=0)
    return C


def knn_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF approximate top-k cosine search — the inverted-file scale
    path next to brute force (knn_cosine_topk) and hyperplane LSH
    (knn_lsh_topk): a coarse k-means quantizer trained on a bounded
    driver-side sample, vectors assigned to their nearest centroid
    per batch (vectorized), and each query scored ONLY against vectors
    in its nprobe closest lists. Rows-only; pytest checks recall vs
    the exact result."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample_df = (read_table(sf_dir, "embeddings",
                            columns=["vec_id", "embedding"],
                            filter=(pc.field("vec_id") < _IVF_SAMPLE))
                 .to_pandas())
    if sample_df.empty:
        from ._qutil import empty_frame
        return empty_frame(query_id="int64", neighbor_id="int64",
                           score="float64", rank="int64")
    S = np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    C = _ivf_train(S, min(_IVF_NLIST, len(S)), _IVF_ITERS)
    qdf = (read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                      filter=(pc.field("vec_id") < KNN_NUM_QUERIES))
           .to_pandas())
    if qdf.empty:
        from ._qutil import empty_frame
        return empty_frame(query_id="int64", neighbor_id="int64",
                           score="float64", rank="int64")
    qdf = qdf.sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy()
    # nprobe nearest lists per query (tiny: nq x nlist)
    qd2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probe_lists = np.argsort(qd2, axis=1)[:, :_IVF_NPROBE]
    q_ref = ray.put((qids, Q, C, probe_lists))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, Q_, C_, probes_ = ray.get(q_ref)
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        V = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(len(t), -1)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = vids >= KNN_NUM_QUERIES
        V, vids = V[keep], vids[keep]
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        if len(vids):
            # vectorized coarse assignment of the batch
            d2 = ((V ** 2).sum(axis=1)[:, None]
                  - 2.0 * (V @ C_.T) + (C_ ** 2).sum(axis=1)[None, :])
            assign = d2.argmin(axis=1)
            vnorm = np.linalg.norm(V, axis=1)
            for qi in range(len(qids_)):
                cand = np.isin(assign, probes_[qi])
                if not cand.any():
                    continue
                Vc, vc, nc = V[cand], vids[cand], vnorm[cand]
                s = np.round((Vc @ Q_[qi]) /
                             (np.linalg.norm(Q_[qi]) * nc), 6)
                idx = np.lexsort((vc, -s))[:KNN_K]
                rows["query_id"].extend([int(qids_[qi])] * len(idx))
                rows["neighbor_id"].extend(int(v) for v in vc[idx])
                rows["score"].extend(float(x) for x in s[idx])
        return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                         "neighbor_id": pa.array(rows["neighbor_id"],
                                                 pa.int64()),
                         "score": pa.array(rows["score"], pa.float64())})

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"],
                          ascending=[False, True]).head(KNN_K)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.map_batches(partial_topk, batch_format="pyarrow")
              .groupby("query_id")
              .map_groups(final_topk, batch_format="pandas")
              .to_pandas())


def doc_maker_norm(sf_dir: str) -> pd.DataFrame:
    """The reference's maker charset normalization (M6,
    final_run_ocr.py:355-359) as a vectorized Arrow kernel chain over
    the documents table: uppercase -> keep only [A-Z0-9 &'-] ->
    collapse runs of spaces -> trim."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        x = pc.utf8_upper(t["text"])
        x = pc.replace_substring_regex(x, pattern="[^A-Z0-9 &'-]",
                                       replacement="")
        x = pc.replace_substring_regex(x, pattern=" +", replacement=" ")
        x = pc.utf8_trim(x, characters=" ")
        return pa.table({"doc_id": t["doc_id"], "maker_norm": x})

    return ds.map_batches(norm, batch_format="pyarrow").to_pandas()


DOC_MAKER_NORM_SQL = """
SELECT doc_id,
       trim(regexp_replace(
         regexp_replace(upper(text), '[^A-Z0-9 &''-]', '', 'g'),
         ' +', ' ', 'g'), ' ') AS maker_norm
FROM documents
"""


SIMHASH_MAX_HAMMING = 12


def simhash_near_dup(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup pairs: 64-bit signatures banded into 4x16-bit
    chunks, candidates = pairs sharing at least one exact band (a
    deterministic set — the salted grouping only partitions work),
    verified by exact Hamming <= 12. Oracle: ``SIMHASH_NEAR_DUP_SQL``
    reproduces both the banding predicate and the Hamming filter."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        # batched: one flat token-hash pass + np.add.reduceat SimHash
        # for the whole batch (bit-identical to per-doc simhash64)
        tok_lists = [t.lower().split() for t in df["text"]]
        offsets = np.zeros(len(tok_lists) + 1, dtype=np.int64)
        np.cumsum([len(t) for t in tok_lists], out=offsets[1:])
        hashes = TS.stable_hashes64([t for toks in tok_lists
                                     for t in toks])
        H = TS.simhash64_batch(hashes, offsets)
        bands = np.arange(4, dtype=np.uint64)
        chunks = ((H[:, None] >> (np.uint64(16) * bands[None, :])) &
                  np.uint64(0xFFFF)).astype(np.int64)
        # int64 storage offset: h - 2^63 == (h XOR 2^63) reinterpreted
        sim = (H ^ np.uint64(1 << 63)).view(np.int64)
        n = len(tok_lists)
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), 4),
            "band": np.tile(np.arange(4, dtype=np.int64), n),
            "bucket": chunks.reshape(-1),
            "bucket_mod": chunks.reshape(-1) % _BUCKET_SALT,
            "sim": np.repeat(sim, 4)})

    def ham_filter(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        # the 2^63 storage offset flips only the top bit, which cancels
        # under XOR: (h-2^63) ^ (h'-2^63) == h ^ h' bit-for-bit, so XOR
        # the stored int64s directly and popcount via unpackbits
        x = (df["sim_a"].to_numpy() ^ df["sim_b"].to_numpy()).astype(
            np.int64)
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= SIMHASH_MAX_HAMMING
        return pd.DataFrame({"doc_a": df["doc_a"].to_numpy()[keep],
                             "doc_b": df["doc_b"].to_numpy()[keep],
                             "hamming": ham[keep]})

    import functools
    out = (ds.map_batches(sig_rows, batch_format="pandas")
             .groupby(["band", "bucket_mod"])
             .map_groups(functools.partial(_bucket_pairs, extra_col="sim"),
                         batch_format="pandas")
             .map_batches(ham_filter, batch_format="pandas")
             .to_pandas())
    if out.empty:
        return out
    return (out.drop_duplicates(subset=["doc_a", "doc_b"])
               .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


def doc_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic content-hash sampling (~12.5%): rows whose
    md5(doc_id) starts with hex 0 or 1 — a reproducible sample operator
    whose oracle is exact (unlike seeded random_sample)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(
            lambda d: hashlib.md5(str(d).encode()).hexdigest()[0])
        return df[h.isin(["0", "1"])]

    return ds.map_batches(pick, batch_format="pandas").to_pandas()


DOC_SAMPLE_SQL = """
SELECT doc_id, n_chars FROM documents
WHERE substr(md5(doc_id::VARCHAR), 1, 1) IN ('0', '1')
"""


def doc_rolling_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Winnowing-style rolling-hash document fingerprint (min 16-char
    window hash, order-sensitive). Oracle: ``DOC_ROLLING_FP_SQL``
    expands the recursion into per-window polynomial sums."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "fingerprint": df["text"].map(
                lambda s: format(TS.rolling_fingerprint(s), "016x"))})

    return ds.map_batches(fp, batch_format="pandas").to_pandas()


def simhash_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Per-document 64-bit SimHash (hex) over word tokens. Token
    hashes are md5-derived (``textstats._stable_hash64``), which makes
    the whole sketch exactly reproducible in SQL — oracle:
    ``SIMHASH_FP_SQL`` (64-way bit expansion + sign sums in DuckDB)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sh(df: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [t.lower().split() for t in df["text"]]
        offsets = np.zeros(len(tok_lists) + 1, dtype=np.int64)
        np.cumsum([len(t) for t in tok_lists], out=offsets[1:])
        hashes = TS.stable_hashes64([t for toks in tok_lists
                                     for t in toks])
        H = TS.simhash64_batch(hashes, offsets)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "simhash": [format(int(h), "016x") for h in H]})

    return ds.map_batches(sh, batch_format="pandas").to_pandas()


# Shared oracle CTE reproducing simhash64 exactly: md5-derived 64-bit
# token hashes, per-(doc, bit) sign sums, little-endian bit packing,
# empty doc -> 0 (the LEFT JOIN leg).
_SIMHASH_FP_CTE = r"""
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
  FROM documents),
h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h64
  FROM toks WHERE tok <> ''),
bits AS (
  SELECT doc_id, b.bit AS bit,
         sum(CASE WHEN (h64 >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) b
  GROUP BY 1, 2),
fp0 AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::UBIGINT << bit)
                  ELSE 0::UBIGINT END)::UBIGINT AS s
  FROM bits GROUP BY 1),
fp AS (
  SELECT d.doc_id, coalesce(fp0.s, 0::UBIGINT) AS s
  FROM documents d LEFT JOIN fp0 USING (doc_id))
"""

SIMHASH_FP_SQL = ("WITH " + _SIMHASH_FP_CTE + """
SELECT doc_id, lower(lpad(hex(s), 16, '0')) AS simhash FROM fp
""")

# Near-dup oracle: the banded candidate set is EXACTLY "pairs sharing
# at least one 16-bit band" (the pipeline's salted bucket_mod grouping
# only partitions work — every exact-band-equal pair stays within one
# (band, bucket_mod) group), then verified at Hamming <= 12, so the
# pipeline output is deterministic and SQL-checkable despite banding.
SIMHASH_NEAR_DUP_SQL = ("WITH " + _SIMHASH_FP_CTE + f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.s, b.s))::BIGINT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id AND (
     (a.s >> 0)  & 65535 = (b.s >> 0)  & 65535
  OR (a.s >> 16) & 65535 = (b.s >> 16) & 65535
  OR (a.s >> 32) & 65535 = (b.s >> 32) & 65535
  OR (a.s >> 48) & 65535 = (b.s >> 48) & 65535)
WHERE bit_count(xor(a.s, b.s)) <= {SIMHASH_MAX_HAMMING}
""")


MINHASH_SIG_PERMS = 128


def minhash_signatures(sf_dir: str) -> pd.DataFrame:
    """Per-document 128-perm MinHash signature, folded to
    ``md5(",".join(signature))`` so the FULL signature is value-checked
    compactly. Oracle ``MINHASH_SIG_SQL`` reproduces the sketch
    end-to-end in DuckDB: md5 shingle hashes, the module's fixed
    (a*x+b) mod p family (A/B constants embedded as a VALUES list),
    per-perm minima, and the same md5 fold — upgrading the MinHash
    stack from rows-only to hash-checked."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        sh_lists = []
        for text in df["text"]:
            toks = text.lower().strip().split()
            if len(toks) <= 3:
                sh_lists.append([" ".join(toks)])
            else:
                sh_lists.append(sorted(
                    {" ".join(toks[i:i + 3])
                     for i in range(len(toks) - 2)}))
        offsets = np.zeros(len(sh_lists) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in sh_lists], out=offsets[1:])
        hashes = TS.stable_hashes64([s for sh in sh_lists for s in sh])
        sigs = TS.minhash_signatures_batch(hashes, offsets,
                                           MINHASH_SIG_PERMS)
        digests = [hashlib.md5(
            ",".join(str(int(v)) for v in row).encode()).hexdigest()
            for row in sigs]
        return pd.DataFrame({"doc_id": df["doc_id"], "sig_md5": digests})

    return ds.map_batches(sig, batch_format="pandas").to_pandas()


def _minhash_sig_sql() -> str:
    vals = ",".join(
        f"({i},{int(TS._MINHASH_A[i])}::UBIGINT,"
        f"{int(TS._MINHASH_B[i])}::UBIGINT)"
        for i in range(MINHASH_SIG_PERMS))
    return rf"""
WITH perms(perm, a, b) AS (SELECT * FROM (VALUES {vals})),
toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS arr
  FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(arr) <= 3
           THEN [array_to_string(arr, ' ')]
           ELSE list_transform(generate_series(1, len(arr) - 2),
                               i -> array_to_string(arr[i:i+2], ' ')) END))
             AS s
  FROM toks),
x AS (
  SELECT doc_id, xor(h64 & 4294967295::UBIGINT, h64 >> 32) AS x
  FROM (SELECT doc_id,
               ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h64 FROM sh)),
mins AS (
  SELECT doc_id, perm, min((a * x + b) % 4294967311::UBIGINT) AS v
  FROM x CROSS JOIN perms GROUP BY 1, 2)
SELECT doc_id, md5(string_agg(v::VARCHAR, ',' ORDER BY perm)) AS sig_md5
FROM mins GROUP BY doc_id
"""


MINHASH_SIG_SQL = _minhash_sig_sql()


# ----------------------------------------------------- corpus top terms

TOP_TERMS_K = 20


def doc_top_terms(sf_dir: str) -> pd.DataFrame:
    """Corpus-level term statistics: top-K non-stopword terms by total
    occurrence count (ties broken by term).

    The canonical pre-aggregation pattern for a 100-TB vocabulary: each
    batch emits one row per DISTINCT term in the batch (occurrence
    count + document frequency partials), so the shuffle carries
    ~vocab-per-batch rows, never one row per token; the global combine
    is a small Sum groupby and the top-K is a distributed
    sort + limit — the full vocabulary never lands on the driver.
    Document-frequency partials sum exactly because each document
    appears in exactly one batch (one row per doc)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split()
        ex = toks.explode().dropna()
        d = pd.DataFrame({
            "term": ex.to_numpy(),
            "doc_id": df["doc_id"].reindex(ex.index).to_numpy()})
        d = d[~d["term"].isin(TS.STOPWORDS)]
        agg = (d.groupby("term", sort=False)
                .agg(cnt=("doc_id", "size"), n_docs=("doc_id", "nunique"))
                .reset_index())
        agg["cnt"] = agg["cnt"].astype("int64")
        agg["n_docs"] = agg["n_docs"].astype("int64")
        return agg

    return (ds.map_batches(partial, batch_format="pandas")
              .groupby("term")
              .aggregate(Sum("cnt", alias_name="cnt"),
                         Sum("n_docs", alias_name="n_docs"))
              .sort(["cnt", "term"], descending=[True, False])
              .limit(TOP_TERMS_K)
              .to_pandas())


_STOP_NOT_IN = ", ".join(f"'{w}'" for w in sorted(TS.STOPWORDS))

DOC_TOP_TERMS_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents)
SELECT term, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
FROM toks
WHERE term <> '' AND term NOT IN ({_STOP_NOT_IN})
GROUP BY term
ORDER BY cnt DESC, term ASC
LIMIT {TOP_TERMS_K}
"""


# ------------------------------------------------ exact vector dedup

def embedding_dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact duplicate-VECTOR dedup: md5 over the raw little-endian
    float32 bytes hash-partitions identical embeddings; first-wins
    (min vec_id) + group size per distinct vector. Only the 32-hex
    digest and the id leave the map stage — the vectors themselves are
    never shuffled, which is what makes this viable when the embedding
    table is tens of TB."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def h(df: pd.DataFrame) -> pd.DataFrame:
        keys = []
        for v in df["embedding"]:
            a = np.ascontiguousarray(v, dtype=np.float32)
            # canonicalize before hashing so byte-equality matches
            # SQL VALUE-equality: -0.0 -> +0.0 (adding 0.0 flips the
            # sign bit) and any NaN payload -> the canonical nan
            a = a + np.float32(0.0)
            if np.isnan(a).any():
                a = np.where(np.isnan(a), np.float32(np.nan), a)
            keys.append(hashlib.md5(a.tobytes()).hexdigest())
        return pd.DataFrame({"vec_hash": keys,
                             "vec_id": df["vec_id"].to_numpy()})

    from ray.data.aggregate import Min
    return (ds.map_batches(h, batch_format="pandas")
              .groupby("vec_hash")
              .aggregate(Min("vec_id", alias_name="keep_vec_id"),
                         Count(alias_name="n_copies"))
              .drop_columns(["vec_hash"])
              .to_pandas())


EMBEDDING_DEDUP_SQL = """
SELECT min(vec_id) AS keep_vec_id, count(*) AS n_copies
FROM embeddings GROUP BY embedding
"""


# ------------------------------------- rolling-fingerprint SQL oracle

def _rolling_fp_sql() -> str:
    """DuckDB oracle for ``doc_rolling_fingerprint``: the stepwise
    rolling hash is mod-linear, so each window hash equals the
    polynomial sum  (b_j + 1) * BASE^(L-1-j) mod M  computed directly —
    chars cross-joined with a 16-row power table, grouped per window,
    min per doc. Exact (integer arithmetic in HUGEINT; one mod at the
    end is ring-equal to the per-step mod). Assumes an ASCII corpus
    (``ord(substr)`` = utf-8 byte), which holds for the driver
    testdata; the Ray side is general utf-8."""
    B, M = TS._ROLL_BASE, TS._ROLL_MOD
    pows = ", ".join(f"({j}, {pow(B, j, M)})" for j in range(16))
    return f"""
WITH pos AS (
  SELECT doc_id, length(text) AS n, text,
         unnest(range(1, length(text) + 1)) AS i
  FROM documents),
chars AS (
  SELECT doc_id, n, i, ord(substr(text, i, 1)) + 1 AS v,
         least(n, 16) AS L
  FROM pos),
powers(e, pw) AS (VALUES {pows}),
terms AS (
  SELECT c.doc_id, c.i - c.L + 1 + p.e AS wi,
         c.v::HUGEINT * p.pw AS term, c.n, c.L
  FROM chars c JOIN powers p ON p.e < c.L),
windows AS (
  SELECT doc_id, wi, sum(term) % {M} AS wh
  FROM terms WHERE wi >= 1 AND wi + L - 1 <= n
  GROUP BY doc_id, wi)
SELECT d.doc_id,
       coalesce(printf('%016x', (min(w.wh))::BIGINT),
                '0000000000000000') AS fingerprint
FROM documents d LEFT JOIN windows w USING (doc_id)
GROUP BY d.doc_id
"""


DOC_ROLLING_FP_SQL = _rolling_fp_sql()


# ----------------------------------------------------- tf-idf ranking

TFIDF_TERMS = ("hash", "join", "sort", "stream", "window")
TFIDF_K = 20


def doc_tfidf_topk(sf_dir: str) -> pd.DataFrame:
    """TF-IDF relevance ranking for a fixed query-term set — the
    training-data relevance-scoring op. Scores are EXACT integers
    computed with pure integer arithmetic on BOTH sides:
    idf_e6 = (1e6 * (N+1)) // (df+1) (linear inverse-document-
    frequency weighting; the log variant is a one-line swap but would
    hinge the oracle hash on cross-library libm ulp agreement),
    score = sum tf*idf_e6 — no float ever enters the compared values.

    100-TB shape: the map stage emits only (doc_id, term, tf) rows
    RESTRICTED to the query terms (<= |terms| rows per doc — tiny),
    that table is materialized once and reused for both the df
    aggregate (|terms| rows) and the per-doc score groupby; the text
    column is scanned exactly once and never shuffled."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split()
        ex = toks.explode().dropna()
        d = pd.DataFrame({
            "term": ex.to_numpy(),
            "doc_id": df["doc_id"].reindex(ex.index).to_numpy()})
        d = d[d["term"].isin(TFIDF_TERMS)]
        agg = (d.groupby(["doc_id", "term"], sort=False).size()
                .reset_index(name="tf"))
        agg["tf"] = agg["tf"].astype("int64")
        return agg

    n_docs = read_table(sf_dir, "documents", columns=["doc_id"]).count()
    tf = ds.map_batches(tf_rows, batch_format="pandas").materialize()
    df_t = tf.groupby("term").aggregate(Count(alias_name="df")).to_pandas()
    if df_t.empty:
        from ._qutil import empty_frame
        return empty_frame(doc_id="int64", score_e6="int64",
                           rank="int64")
    idf_e6 = {t: (1_000_000 * (n_docs + 1)) // (int(d) + 1)
              for t, d in zip(df_t["term"], df_t["df"])}

    def score_parts(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": df["doc_id"],
            "part": df["tf"].to_numpy() *
            df["term"].map(idf_e6).to_numpy().astype(np.int64)})
        return out

    scored = (tf.map_batches(score_parts, batch_format="pandas")
                .groupby("doc_id")
                .aggregate(Sum("part", alias_name="score_e6"))
                .sort(["score_e6", "doc_id"], descending=[True, False])
                .limit(TFIDF_K)
                .to_pandas())
    scored["score_e6"] = scored["score_e6"].astype("int64")
    scored["rank"] = np.arange(1, len(scored) + 1, dtype=np.int64)
    return scored


_TFIDF_IN = ", ".join(f"'{t}'" for t in TFIDF_TERMS)

DOC_TFIDF_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
  WHERE term IN ({_TFIDF_IN}) GROUP BY 1, 2),
n AS (SELECT count(*)::BIGINT AS n FROM documents),
idf AS (
  SELECT term,
         (1000000 * (n.n + 1)) // (count(DISTINCT tf.doc_id) + 1)
             AS idf_e6
  FROM tf, n GROUP BY term, n.n),
scores AS (
  SELECT tf.doc_id, sum(tf.tf * idf.idf_e6)::BIGINT AS score_e6
  FROM tf JOIN idf USING (term) GROUP BY 1)
SELECT doc_id, score_e6,
       row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rank
FROM scores ORDER BY score_e6 DESC, doc_id LIMIT {TFIDF_K}
"""


# ---------------------------------------- cross-table lang centroids

def embedding_lang_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-LANGUAGE embedding centroid — the documents x embeddings
    fact-fact join: each document's predicted language (the same
    marker heuristic as doc_lang_id) is a skinny derived dimension
    hash-joined to its embedding row on id, then per-batch partial
    sums per language -> tiny grouped combine.

    100-TB shape: only (id, lang) rows and the vectors cross the join
    exchange once (keyed by id, partitions sized by join_partitions);
    the dimension-exploded sums are reduced per batch BEFORE the
    combine, so the wide groupby carries |langs| x dims rows total.
    Vectors travel through the join PACKED as fixed-size binary —
    Acero's hash join does not carry list-typed payload columns, and
    the packed form is also 4x smaller than the float64 list."""
    from ._qutil import join_partitions
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def lang_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vec_id": df["doc_id"],
                             "pred_lang": df["text"].map(TS.lang_id)})

    langs = docs.map_batches(lang_rows, batch_format="pandas")
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # the embedding dim, read once driver-side (limit-pushdown scan of
    # one row), so EVERY packed block — including empty ones — carries
    # the same fixed_size_binary[4*dim] type (a mixed binary()/
    # fixed_size_binary schema fails block unification)
    first = emb.take(1)
    if not first:
        return pd.DataFrame({"pred_lang": pd.Series([], dtype=object),
                             "dim": pd.Series([], dtype="int64"),
                             "avg_val": pd.Series([], dtype="float64")})
    dim = len(first[0]["embedding"])
    bin_type = pa.binary(4 * dim)

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "vec_bin": pa.array([], bin_type)})
        emb_col = t["embedding"]
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        m = emb_col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float32).reshape(len(t), dim)
        vec_bin = pa.Array.from_buffers(
            bin_type, len(t),
            [None, pa.py_buffer(np.ascontiguousarray(m).tobytes())])
        return pa.table({"vec_id": t["vec_id"], "vec_bin": vec_bin})

    joined = (emb.map_batches(pack, batch_format="pyarrow")
                 .join(langs, join_type="inner",
                       num_partitions=join_partitions(), on=("vec_id",)))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pred_lang": pa.array([], pa.string()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "c": pa.array([], pa.int64())})
        b = t["vec_bin"]
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        width = b.type.byte_width
        m = np.frombuffer(b.buffers()[1], dtype=np.float32,
                          count=len(t) * (width // 4),
                          offset=b.offset * width
                          ).reshape(len(t), -1).astype(np.float64)
        labels = t["pred_lang"].to_numpy(zero_copy_only=False)
        return _centroid_partials(labels, m, "pred_lang")

    out = (joined.map_batches(partial, batch_format="pyarrow")
                 .groupby(["pred_lang", "dim"])
                 .aggregate(Sum("s", alias_name="s"),
                            Sum("c", alias_name="c"))
                 .to_pandas())
    out["avg_val"] = np.round(out["s"] / out["c"], 6)
    return out[["pred_lang", "dim", "avg_val"]]


EMBEDDING_LANG_CENTROIDS_SQL = f"""
WITH lang AS ({DOC_LANG_ID_SQL})
SELECT pred_lang, dim, round(avg(ev), 6) AS avg_val
FROM (SELECT l.pred_lang,
             unnest(emb.embedding::DOUBLE[]) AS ev,
             unnest(generate_series(1, len(emb.embedding))) AS dim
      FROM embeddings emb JOIN lang l ON emb.vec_id = l.doc_id)
GROUP BY 1, 2
"""
