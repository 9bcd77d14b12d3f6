"""JSONL / TXT record store (reference S4/S5 sources + K1/K2 sinks).

The reference keeps its databases as append-only ``.jsonl`` (full
records) or ``.txt`` (one canonical ``MAKER|VINTAGE`` key per line,
``#`` comments skipped) and backfills ``key``/``id`` on load
(``ocr_scripts[NOT BEING USED]/scan_and_store.py:55-119``). Here:

- ``read_records``: Ray Data read (``read_json``/``read_text``) +
  a vectorized backfill projection with the exact reference semantics.
- ``write_records``: the K1/K2 sink re-expressed as an idempotent
  partitioned write — ``.jsonl`` via ``write_json`` (full records),
  ``.txt`` emulated as key-only JSON lines (append semantics become
  whole-dataset rewrites under the checkpoint layer; see
  stages/checkpoint.py for durable incremental commits).
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd
import ray.data

from ..functions.text import canonical_key, hash_id


def _backfill(df: pd.DataFrame) -> pd.DataFrame:
    """scan_and_store.py:98-105 — ensure maker_norm/vintage/key/id."""
    if "maker_norm" not in df:
        df["maker_norm"] = ""
    df["maker_norm"] = df["maker_norm"].fillna("")
    if "vintage" not in df:
        df["vintage"] = None
    # undo pandas float64 coercion of missing-int columns: NaN -> None,
    # 2019.0 -> 2019, so keys read 'MAKER|2019' / 'MAKER|' like the
    # reference, never 'MAKER|2019.0' / 'MAKER|nan'
    df["vintage"] = pd.Series(
        [None if v is None or (isinstance(v, float) and pd.isna(v))
         else (int(v) if isinstance(v, float) and v.is_integer() else v)
         for v in df["vintage"]], index=df.index, dtype=object)
    if "key" not in df:
        df["key"] = None
    if "id" not in df:
        df["id"] = None
    df["key"] = [k if k else canonical_key(m, v)
                 for k, m, v in zip(df["key"], df["maker_norm"],
                                    df["vintage"])]
    df["id"] = [i if i else hash_id(m, v)
                for i, m, v in zip(df["id"], df["maker_norm"],
                                   df["vintage"])]
    return df


def _parse_txt(df: pd.DataFrame) -> pd.DataFrame:
    """scan_and_store.py:73-88 — one key per line, # comments skipped."""
    keys = df["text"].str.strip()
    keep = (keys != "") & ~keys.str.startswith("#")
    keys = keys[keep]
    split = keys.str.split("|", n=1)
    maker = split.str[0]
    vintage = split.str[1].where(split.str.len() > 1, "")
    vintage = vintage.replace("", None)
    return pd.DataFrame({
        "maker_norm": maker,
        "vintage": vintage,
        "key": keys,
        "id": [hash_id(m, v) for m, v in zip(maker, vintage)],
    })


def read_records(path: str) -> "ray.data.Dataset":
    from .._rayprep import ensure_serializable
    ensure_serializable()
    if path.lower().endswith(".txt"):
        ds = ray.data.read_text(path)
        return ds.map_batches(_parse_txt, batch_format="pandas")

    # line-wise python json parse: arrow's JSON reader rejects the
    # reference's heterogenous nested ocr_raw maps; nested values are
    # re-serialized into a raw_json string column
    import json as _json

    def parse_lines(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for line in df["text"]:
            line = line.strip()
            if not line:
                continue
            try:
                rec = _json.loads(line)
            except ValueError:
                continue
            flat = {k: v for k, v in rec.items()
                    if not isinstance(v, (dict, list))}
            nested = {k: v for k, v in rec.items()
                      if isinstance(v, (dict, list))}
            if nested:
                flat["raw_json"] = _json.dumps(nested, ensure_ascii=False)
            rows.append(flat)
        return _backfill(pd.DataFrame(rows)) if rows else pd.DataFrame(
            {"maker_norm": [], "vintage": [], "key": [], "id": []})

    ds = ray.data.read_text(path)
    return ds.map_batches(parse_lines, batch_format="pandas")


def write_records(ds: "ray.data.Dataset", out_dir: str,
                  fmt: Optional[str] = None) -> None:
    """fmt='txt' -> key-only lines; default full-record JSONL dir."""
    if fmt == "txt":
        keys = ds.map_batches(
            lambda df: pd.DataFrame({"text": df["key"]}),
            batch_format="pandas")
        os.makedirs(out_dir, exist_ok=True)
        # write_text does not exist; keys-only as single-column JSON
        keys.write_json(out_dir)
    else:
        ds.write_json(out_dir)
