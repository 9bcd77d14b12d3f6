"""Checkpointed, resumable pipeline runs (north-rule requirement).

The reference's only durability is append-only JSONL with no
idempotence (``hybrid.py:270-271``, ``scan_and_store.py:108-119`` —
re-running re-appends). Here a run is split into PARTITIONS (one per
input document shard file); each partition is written atomically
(temp dir + rename) together with a manifest carrying lineage (input
file, size, config hash) and extraction metrics (row/valid/vintage/
maker/barcode counts, mean OCR confidence). A restarted run lists the
committed manifests, verifies lineage, and skips those partitions —
so a crash mid-run costs only the in-flight partition.

Layout:
    out_dir/part=<shard>/*.parquet      (atomic: renamed from _tmp.<shard>)
    out_dir/_manifests/<shard>.json
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
from dataclasses import asdict
from typing import Dict, List, Optional

from ..config import PipelineConfig


# only SEMANTIC knobs enter lineage — changing pool sizes, batch
# sizes, block counts or debug output must not invalidate partitions
_SEMANTIC_KEYS = ("confidence_threshold", "box_pad", "min_blob_area",
                  "maker_threshold", "blob_threshold", "pair_threshold",
                  "blob_weights", "crop_label", "skip_alignment")


def _config_hash(cfg: PipelineConfig) -> str:
    d = asdict(cfg)
    payload = {k: d[k] for k in _SEMANTIC_KEYS}
    return hashlib.sha1(json.dumps(payload, sort_keys=True,
                                   default=str).encode()).hexdigest()[:12]


def _lineage(doc_file: str, cfg: PipelineConfig) -> Dict:
    st = os.stat(doc_file)
    return {"input_file": doc_file, "input_bytes": st.st_size,
            "input_mtime_ns": st.st_mtime_ns,
            "config_hash": _config_hash(cfg)}


def discover_partitions(corpus_dir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(corpus_dir, "documents",
                                         "*.parquet")))


def committed_partitions(out_dir: str) -> Dict[str, Dict]:
    """shard-name -> manifest for every committed partition."""
    out = {}
    for path in glob.glob(os.path.join(out_dir, "_manifests", "*.json")):
        with open(path) as f:
            out[os.path.splitext(os.path.basename(path))[0]] = json.load(f)
    return out


def run_checkpointed(corpus_dir: str, out_dir: str,
                     cfg: Optional[PipelineConfig] = None, *,
                     fail_after: Optional[int] = None) -> Dict:
    """Run the flagship pipeline partition-by-partition with atomic
    commits; skips partitions already committed with matching lineage.
    ``fail_after=k`` injects a crash after k commits (for resume tests).

    Returns {"partitions": total, "executed": n, "skipped": n,
             "metrics": aggregated}.
    """
    from .. import synth  # noqa: F401  (corpus format docs)
    from ..pipelines.extract import build_extract_pipeline

    cfg = cfg or PipelineConfig()
    shards = discover_partitions(corpus_dir)
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    committed = committed_partitions(out_dir)

    executed = skipped = 0
    totals = {"rows": 0, "valid": 0, "vintage_found": 0, "maker_found": 0,
              "barcode_found": 0, "blob_nonempty": 0}
    for i, shard_path in enumerate(shards):
        name = os.path.splitext(os.path.basename(shard_path))[0]
        lineage = _lineage(shard_path, cfg)
        prior = committed.get(name)
        if prior and prior.get("lineage") == lineage:
            skipped += 1
            for k in totals:
                totals[k] += prior["metrics"][k]
            continue

        ds = build_extract_pipeline(corpus_dir, cfg, doc_files=[shard_path])
        tmp_dir = os.path.join(out_dir, f"_tmp.{name}")
        final_dir = os.path.join(out_dir, f"part={name}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        ds.write_parquet(tmp_dir)

        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        t = pads.dataset(tmp_dir).to_table(
            columns=["valid", "vintage", "maker_name", "barcode",
                     "mean_ocr_conf", "blob"])
        metrics = {
            "rows": t.num_rows,
            "valid": int(pc.sum(pc.cast(t["valid"], "int64")).as_py() or 0),
            "vintage_found": int(t.num_rows -
                                 t["vintage"].null_count),
            "maker_found": int(t.num_rows - t["maker_name"].null_count),
            "barcode_found": int(t.num_rows - t["barcode"].null_count),
            "blob_nonempty": int(pc.sum(pc.cast(pc.greater(
                pc.struct_field(t["blob"], "blob_count"), 0),
                "int64")).as_py() or 0),
            "mean_ocr_conf": float(pc.mean(t["mean_ocr_conf"]).as_py()
                                   or 0.0),
        }
        os.rename(tmp_dir, final_dir)  # atomic commit
        with open(os.path.join(out_dir, "_manifests", f"{name}.json"),
                  "w") as f:
            json.dump({"lineage": lineage, "metrics": metrics,
                       "partition": f"part={name}"}, f)
        executed += 1
        for k in totals:
            totals[k] += metrics[k]
        if fail_after is not None and executed >= fail_after:
            raise RuntimeError(f"injected failure after {executed} partitions")

    return {"partitions": len(shards), "executed": executed,
            "skipped": skipped, "metrics": totals}
