"""Detect / OCR / Barcode engine interfaces + deterministic synthetic
implementations.

The reference holds YOLO and PaddleOCR as lazy module-global singletons
(``data_extraction_functions/final_run_ocr.py:41-51,58-80``); in the
Ray Data engine that lifecycle becomes *actor state*: an engine is
constructed once in a ``map_batches`` actor's ``__init__`` and reused
per batch. Production adapters (ultralytics YOLO, PaddleOCR, Tesseract,
pyzbar) would subclass the same ABCs; none of those libraries exist in
this environment, so the shipped engines decode the synthetic payload's
embedded ground truth deterministically (SURVEY.md section 7.0).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..functions import imaging
from ..functions.blobs import blob_fingerprint
# NOTE: package-internal imports must stay at module top level — the
# package ships to workers via cloudpickle by-value registration, and a
# deferred relative import inside a method would attempt a real
# `import wine_label_ocr_ray...` on the worker (ModuleNotFoundError
# when the driver's cwd is not the repo).
from ..functions.enhance import align_vertically, find_label_roi
from ..synth import decode_payload


class DetectEngine(ABC):
    """Label-element detector (reference classes: Distinct Logo /
    Maker-Name / Vintage, ``final_run_ocr.py:404``)."""

    @abstractmethod
    def detect(self, decoded: Dict) -> List[Dict]:
        """decoded payload header -> [{'class', 'box', 'confidence'}]."""


class OcrEngine(ABC):
    @abstractmethod
    def ocr_box(self, decoded: Dict, box: List[float]) -> Tuple[List[str], List[float]]:
        """OCR the (padded) crop box -> (texts, confs)."""

    @abstractmethod
    def ocr_full(self, decoded: Dict) -> List[str]:
        """Full-image OCR (the fallback sweep's view): every text the
        image contains, including outside detection boxes."""


class BarcodeEngine(ABC):
    @abstractmethod
    def scan(self, decoded: Dict) -> Optional[str]:
        """First decoded barcode string or None (QRCodeScanner.py:84-96)."""


class SyntheticDetectEngine(DetectEngine):
    """Reads the payload's ground-truth elements; applies the model
    confidence threshold exactly like the reference's YOLO call
    (``final_run_ocr.py:400`` with conf=0.01)."""

    def __init__(self, confidence_threshold: float = 0.01):
        self.confidence_threshold = confidence_threshold

    def detect(self, decoded: Dict) -> List[Dict]:
        out = []
        for el in decoded.get("elements", []):
            if el["conf"] >= self.confidence_threshold:
                out.append({"class": el["cls"], "box": list(el["box"]),
                            "confidence": float(el["conf"])})
        return out


class SyntheticOcrEngine(OcrEngine):
    """Returns the truth text of every element fully inside the crop
    box (the deterministic analog of PaddleOCR reading a crop)."""

    def ocr_box(self, decoded: Dict, box: List[float]) -> Tuple[List[str], List[float]]:
        x1, y1, x2, y2 = box
        texts, confs = [], []
        for el in decoded.get("elements", []):
            ex1, ey1, ex2, ey2 = el["box"]
            if ex1 >= x1 and ey1 >= y1 and ex2 <= x2 and ey2 <= y2:
                if el["truth_text"]:
                    texts.append(el["truth_text"].strip())
                    confs.append(float(el["ocr_conf"]))
        return texts, confs

    def ocr_full(self, decoded: Dict) -> List[str]:
        texts = [el["truth_text"] for el in decoded.get("elements", [])
                 if el["truth_text"]]
        texts.extend(decoded.get("background_texts", []))
        return texts


class SyntheticBarcodeEngine(BarcodeEngine):
    def scan(self, decoded: Dict) -> Optional[str]:
        return decoded.get("barcode")


class BlobAnalyzer:
    """The blob leg (``hybrid.py:277-363``): optional ROI crop (M15
    heuristic) and vertical alignment (M17), then Otsu text mask ->
    connected-component blobs -> fingerprint. Flagship defaults match
    the WineTracker.py:50 flags (full ROI, use_image_as_mask=True,
    skip_alignment=True)."""

    def __init__(self, min_blob_area: float = 30.0, *,
                 crop_label: bool = False, skip_alignment: bool = True):
        self.min_blob_area = min_blob_area
        self.crop_label = crop_label
        self.skip_alignment = skip_alignment

    def analyze(self, gray: np.ndarray) -> Dict:
        H, W = gray.shape[:2]
        x1, y1, x2, y2 = (0, 0, W, H)
        if self.crop_label:
            x1, y1, x2, y2 = find_label_roi(gray)
        roi = gray[y1:y2, x1:x2]
        alignment_angle = 0.0
        if not self.skip_alignment:
            roi, alignment_angle = align_vertically(roi)
        del alignment_angle  # angle is internal; blob schema is fixed
        rh, rw = roi.shape[:2]
        mask, _info = imaging.create_text_mask(roi, use_image_as_mask=True)
        blobs = imaging.extract_smart_blobs(mask, self.min_blob_area)
        fp = blob_fingerprint(blobs, (rh, rw))
        return {"roi_shape": [rh, rw], "blob_count": len(blobs),
                "blob_fingerprint": fp, "blobs": blobs}


def default_engines(confidence_threshold: float = 0.01):
    return (SyntheticDetectEngine(confidence_threshold),
            SyntheticOcrEngine(), SyntheticBarcodeEngine())


__all__ = [
    "DetectEngine", "OcrEngine", "BarcodeEngine",
    "SyntheticDetectEngine", "SyntheticOcrEngine", "SyntheticBarcodeEngine",
    "BlobAnalyzer", "default_engines", "decode_payload",
]
