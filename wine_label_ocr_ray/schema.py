"""Arrow schemas for the interleaved-document data model.

Fixed by BASELINE.json ``input_hint``: one logical table of documents,
each an ordered list of spans; text spans carry inline text, media
spans carry a reference into a payload side table (the stand-in for
images living in blob storage). See SURVEY.md section 1.2 and
FIXTURES.md F1-F3.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),        # "text" | "media"
    ("text", pa.string()),        # inline text ("" for media spans)
    ("media_ref", pa.string()),   # payload key ("" for text spans)
    ("offset", pa.int32()),       # order within the document
])

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

# Media payload side table. ``payload`` is an opaque binary blob the
# engines decode (mirrors images fetched from object storage by key);
# the synthetic payload packs a JSON header (detection ground truth,
# barcode) + a bit-packed edge bitmap for the blob leg.
MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("payload", pa.binary()),
])

OUT_SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),        # extracted text for the span
    ("media_ref", pa.string()),
    ("order", pa.int32()),
])

# The reference record's ocr_raw candidate map
# (scan_and_store.py:175-184: dict<class, list<[text, conf]>> + the
# bare-string vintage_from_fallback) in SURVEY section 1.2's
# list-of-struct-with-bucket form. Entry order preserves the dict
# insertion order the assembly merge relies on; a NULL conf marks a
# bare-string bucket value.
RAW_ENTRY_STRUCT = pa.struct([
    ("bucket", pa.string()),
    ("text", pa.string()),
    ("conf", pa.float64()),
])
RAW_TYPE = pa.list_(RAW_ENTRY_STRUCT)

BLOB_STRUCT = pa.struct([
    ("roi_shape", pa.list_(pa.int32(), 2)),
    ("blob_count", pa.int32()),
    ("blob_fingerprint", pa.string()),
    ("blobs", pa.list_(pa.struct([
        ("x", pa.int32()), ("y", pa.int32()),
        ("w", pa.int32()), ("h", pa.int32()),
        ("cx", pa.float64()), ("cy", pa.float64()),
        ("area", pa.float64()),
        ("aspect_ratio", pa.float64()),
        ("solidity", pa.float64()),
        ("extent", pa.float64()),
    ]))),
])

# Assembled per-document record (reference WineTracker.py:23-29 +
# scan_and_store.py:166-184), emitted by the reassembly stage.
RECORD_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(OUT_SPAN_STRUCT)),
    ("custom_id", pa.string()),
    ("maker_name", pa.string()),
    ("maker_norm", pa.string()),
    ("vintage", pa.int32()),
    ("barcode", pa.string()),
    ("key", pa.string()),
    ("record_id", pa.string()),
    ("valid", pa.bool_()),        # False for the empty-key guard (M28)
    ("mean_ocr_conf", pa.float64()),
    # the single typed blob payload: downstream pair pipelines
    # (blob_near_dup) carry this STRUCT through their shuffles and let
    # Arrow's pandas conversion produce the per-row dicts — no JSON
    # duplicate column (it ~4x'd the record parquet: 45 -> 206 MB at
    # 150k docs) and no per-row Python serialization either
    ("blob", BLOB_STRUCT),
    # ocr_raw, typed end to end — no JSON column anywhere in the record
    ("raw", RAW_TYPE),
])
