"""Media payload store: keyed fetch of payload binaries by ``media_ref``.

At production scale media payloads live in object storage and workers
fetch exactly the refs in their batch — pixels never ride the shuffle
(SURVEY.md section 4.2). This store models that access path over the
corpus's parquet side table:

- fragment ROUTING once per actor: each file's footer statistics give
  the (min, max) ``media_ref`` range (files are written sorted by ref),
  so a fetch opens only the files that can contain its refs;
- per-file reads use an ``isin`` filter (row-group pruning via sorted
  stats) with ``use_threads=False`` — many actors each spinning up a
  full Arrow thread pool thrashes the node.
"""

from __future__ import annotations

import bisect
import glob
import os
from typing import Dict, List

import pyarrow.compute as pc
import pyarrow.parquet as pq


class MediaStore:
    def __init__(self, media_path: str):
        files = sorted(glob.glob(os.path.join(media_path, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"media store not found: {media_path}")
        self._files: List[str] = []
        self._mins: List[str] = []
        self._maxs: List[str] = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            ref_idx = md.schema.to_arrow_schema().get_field_index("media_ref")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ref_idx).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = None, None
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins is None:
                self._mins.append("")          # unknown range: always probe
                self._maxs.append("\U0010ffff")
            else:
                self._mins.append(min(mins))
                self._maxs.append(max(maxs))
            self._files.append(f)
        order = sorted(range(len(self._files)), key=lambda i: self._mins[i])
        self._files = [self._files[i] for i in order]
        self._mins = [self._mins[i] for i in order]
        self._maxs = [self._maxs[i] for i in order]
        # prefix running max of file maxima: the left scan in _route may
        # stop only once NO earlier file can still cover the ref
        self._prefix_max: List[str] = []
        running = ""
        for m in self._maxs:
            running = max(running, m)
            self._prefix_max.append(running)

    def _route(self, refs: List[str]) -> Dict[str, List[str]]:
        by_file: Dict[str, List[str]] = {}
        for r in refs:
            # candidate files: every file whose [min, max] covers r
            # (ranges may overlap across shards)
            i = bisect.bisect_right(self._mins, r) - 1
            j = i
            while j >= 0 and self._prefix_max[j] >= r:
                if self._maxs[j] >= r:
                    by_file.setdefault(self._files[j], []).append(r)
                j -= 1
        return by_file

    def fetch(self, refs: List[str]) -> Dict[str, bytes]:
        """Fetch payloads for a batch of refs. Missing refs are simply
        absent from the result; duplicate refs are fetched once."""
        uniq = sorted(set(refs))
        if not uniq:
            return {}
        out: Dict[str, bytes] = {}
        for path, file_refs in self._route(uniq).items():
            t = pq.read_table(
                path, columns=["media_ref", "payload"],
                filters=pc.field("media_ref").isin(file_refs),
                use_threads=False)
            out.update(zip(t.column("media_ref").to_pylist(),
                           t.column("payload").to_pylist()))
        return out
