"""Debug image side-output (reference K3: the cv2.imwrite composites of
``hybrid.py:367-413``). Off by default; a ``map_batches`` side-effect
stage that writes one binary PGM per media span (gray image + text-mask
overlay rows appended) so runs can be eyeballed without any image
library. Rows pass through untouched."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa

# package-internal imports at module top (by-value pickling rule — see
# state/engines.py note)
from ..functions.imaging import create_text_mask
from ..sources.media import MediaStore
from ..synth import decode_payload


def write_pgm(path: str, img: np.ndarray) -> None:
    """Binary PGM (P5) writer — viewable everywhere, zero deps."""
    H, W = img.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{W} {H}\n255\n".encode())
        f.write(np.ascontiguousarray(img, dtype=np.uint8).tobytes())


class DebugImageSink:
    """Actor stage: decodes each media payload and writes
    ``<out_dir>/<media_ref>.pgm`` with the gray image stacked above its
    Otsu text mask (the reference's composite, minus annotations)."""

    def __init__(self, media_path: str, out_dir: str,
                 limit_per_actor: Optional[int] = 64):
        self._store = MediaStore(media_path)
        self._decode = decode_payload
        self._mask = create_text_mask
        self.out_dir = out_dir
        self.limit = limit_per_actor
        self._written = 0
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.limit is not None and self._written >= self.limit:
            return batch
        kinds = batch.column("kind").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        media_refs = [r for r, k in zip(refs, kinds) if k == "media"]
        payloads = self._store.fetch(media_refs)
        for ref in media_refs:
            if self.limit is not None and self._written >= self.limit:
                break
            payload = payloads.get(ref)
            if payload is None:
                continue
            _, gray = self._decode(payload)
            mask, _ = self._mask(gray, use_image_as_mask=True)
            composite = np.concatenate([gray, mask], axis=0)
            write_pgm(os.path.join(self.out_dir, f"{ref}.pgm"), composite)
            self._written += 1
        return batch
