"""Media payload store: keyed fetch of payload binaries by ``media_ref``.

At production scale media payloads live in object storage and workers
fetch exactly the refs in their batch — pixels never ride the shuffle
(SURVEY.md section 4.2). This store models that access path over the
corpus's parquet side table: a ``pyarrow.dataset`` opened once per
actor, fetched per batch with an ``isin`` filter so parquet row-group
statistics prune IO (media files are written sorted by ``media_ref``).
"""

from __future__ import annotations

import os
from typing import Dict, List

import pyarrow.compute as pc
import pyarrow.dataset as pads


class MediaStore:
    def __init__(self, media_path: str):
        if not os.path.exists(media_path):
            raise FileNotFoundError(f"media store not found: {media_path}")
        self._ds = pads.dataset(media_path, format="parquet")

    def fetch(self, refs: List[str]) -> Dict[str, bytes]:
        """Fetch payloads for a batch of refs. Missing refs are simply
        absent from the result (callers decide whether that is an
        error); duplicate refs are fetched once."""
        uniq = sorted(set(refs))
        if not uniq:
            return {}
        table = self._ds.to_table(
            columns=["media_ref", "payload"],
            filter=pc.field("media_ref").isin(uniq))
        return dict(zip(table.column("media_ref").to_pylist(),
                        table.column("payload").to_pylist()))
