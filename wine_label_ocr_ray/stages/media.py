"""Media-span extraction stage: the stateful actor-pool heart of the
pipeline (detect -> pad/crop -> OCR -> field routing -> blob leg).

This is the Ray Data re-expression of the reference's per-image chain
``final_run_ocr.final_run_ocr`` (``final_run_ocr.py:381-441``) +
``hybrid.final_run_blobs`` (``hybrid.py:277-363``): engines are loaded
once per actor in ``__init__`` (the reference's module-global
singletons, ``final_run_ocr.py:41-80``), each ``__call__`` processes an
Arrow batch of span rows, fetching only that batch's payloads from the
media store. Text rows pass through untouched (see stages/spans.py for
the single-pass routing rationale).

Field-routing semantics are an exact port of ``_extract_fields``
(``final_run_ocr.py:299-351``): per-class candidate buckets, the
longest-maker update rule, vintage overwrite on repeated Vintage
detections, the maker-region year backup, and the full-image fallback
sweep (text side of ``final_run_ocr.py:187-297``, fan-out replaced by
the engine's ``ocr_full`` view) when YOLO found no vintage box.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..functions import text as T
from ..functions.imaging import pad_box
from ..sources.media import MediaStore
from ..state.engines import (BlobAnalyzer, SyntheticBarcodeEngine,
                             SyntheticDetectEngine, SyntheticOcrEngine,
                             decode_payload)

_MAKER_CLASSES = frozenset({"maker_name", "producer", "winery"})
_VINTAGE_CLASSES = frozenset({"vintage", "year"})


def extract_media_fields(decoded: Dict, gray: np.ndarray, *,
                         detect_engine, ocr_engine, barcode_engine,
                         blob_analyzer, pad: float = 0.08) -> Dict:
    """Process ONE media payload -> span-row field dict. Pure given the
    engines. The oracle (oracle.py) re-implements this chain
    independently; the pipeline test asserts the two agree per row."""
    W, H = decoded["w"], decoded["h"]
    detections = detect_engine.detect(decoded)
    out_maker: Optional[str] = None
    out_vintage: Optional[str] = None
    raw: Dict[str, List] = {}
    vintage_by_yolo = False
    span_texts: List[str] = []

    for det in detections:
        cls_lower = det["class"].replace("-", "_").lower()
        box = pad_box(det["box"], W, H, pad=pad)
        texts, confs = ocr_engine.ocr_box(decoded, box)
        txt = " ".join(texts).strip()
        conf = float(np.mean(confs)) if confs else 0.0
        if txt:
            span_texts.append(txt)
        if cls_lower in _MAKER_CLASSES:
            cleaned = T.clean_maker_crop(txt)
            if cleaned and len(cleaned) >= 2:
                if not out_maker or len(cleaned) > len(out_maker):
                    out_maker = cleaned
            raw.setdefault("maker_name_candidates", []).append((cleaned, conf))
            year_in_maker = T.extract_year_from_text(txt)
            if year_in_maker and not out_vintage:
                out_vintage = year_in_maker
                raw.setdefault("vintage_from_maker_region", []).append(
                    (year_in_maker, conf))
        elif cls_lower in _VINTAGE_CLASSES:
            vintage_by_yolo = True
            year = T.extract_year_from_text(txt)
            if year:
                out_vintage = year
            raw.setdefault("vintage_candidates", []).append((txt, conf))
        else:
            raw.setdefault(cls_lower, []).append((txt, conf))

    if not vintage_by_yolo and not out_vintage:
        sweep = T.sweep_year_from_texts(ocr_engine.ocr_full(decoded))
        if sweep:
            out_vintage = sweep
            raw["vintage_from_fallback"] = sweep

    blob = blob_analyzer.analyze(gray)
    return {
        "span_text": " ".join(span_texts).strip(),
        "maker_name": out_maker,
        "raw_json": json.dumps(raw, ensure_ascii=False),
        "vintage_str": out_vintage,
        "vintage_by_yolo": vintage_by_yolo,
        "barcode": barcode_engine.scan(decoded),
        "blob_json": json.dumps(blob, ensure_ascii=False),
    }


class MediaExtract:
    """Actor-pool callable for ``map_batches``. One media store handle
    + engine set per actor; per batch it fetches exactly the refs in
    the batch's media rows."""

    def __init__(self, media_path: str, *, confidence_threshold: float = 0.01,
                 pad: float = 0.08, min_blob_area: float = 30.0):
        self.store = MediaStore(media_path)
        self.detect_engine = SyntheticDetectEngine(confidence_threshold)
        self.ocr_engine = SyntheticOcrEngine()
        self.barcode_engine = SyntheticBarcodeEngine()
        self.blob_analyzer = BlobAnalyzer(min_blob_area)
        self.pad = pad

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        media_idx = [i for i, k in enumerate(kinds) if k == "media"]
        if not media_idx:
            return batch
        refs = batch.column("media_ref").to_pylist()
        payloads = self.store.fetch([refs[i] for i in media_idx])

        cols: Dict[str, List] = {name: batch.column(name).to_pylist()
                                 for name in ("span_text", "maker_name",
                                              "raw_json", "vintage_str",
                                              "vintage_by_yolo", "barcode",
                                              "blob_json")}
        for i in media_idx:
            payload = payloads.get(refs[i])
            if payload is None:
                # poison-pill row: emit an error marker instead of
                # failing the block (SURVEY.md section 4.2 retries note)
                cols["raw_json"][i] = json.dumps({"error": "missing_media"})
                cols["span_text"][i] = ""
                continue
            decoded, gray = decode_payload(payload)
            fields = extract_media_fields(
                decoded, gray, detect_engine=self.detect_engine,
                ocr_engine=self.ocr_engine,
                barcode_engine=self.barcode_engine,
                blob_analyzer=self.blob_analyzer, pad=self.pad)
            for name, value in fields.items():
                cols[name][i] = value

        out = batch
        for name in cols:
            field_idx = out.schema.get_field_index(name)
            out = out.set_column(field_idx, name,
                                 pa.array(cols[name],
                                          out.schema.field(name).type))
        return out
