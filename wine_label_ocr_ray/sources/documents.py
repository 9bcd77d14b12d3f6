"""Document-table reader (format-pluggable: Lance when available,
Parquet otherwise — identical schema, SURVEY.md section 1.2).

The reference's per-image ``cv2.imread`` source
(``final_run_ocr.py:388-396``) maps to reading the interleaved document
table; media payloads are resolved separately (sources/media.py).
"""

from __future__ import annotations

import os
from typing import List, Optional

import ray.data


def _has_lance() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_documents(path: str, *, columns: Optional[List[str]] = None,
                   override_num_blocks: Optional[int] = None) -> "ray.data.Dataset":
    """Read the (doc_id, spans) table. ``path`` may be a directory of
    parquet files, a single file, or a Lance dataset directory."""
    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    if path.endswith(".lance") and _has_lance():
        return ray.data.read_lance(path, **kwargs)
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "documents")):
        path = os.path.join(path, "documents")
    return ray.data.read_parquet(path, **kwargs)
