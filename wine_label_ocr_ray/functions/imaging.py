"""Scipy/cv2-free numpy image primitives for the blob leg.

The reference does these with OpenCV; neither cv2 nor scipy exist in
this environment, so the handful of kernels the blob/fingerprint
operators need are implemented directly in numpy. Semantics follow the
cited reference call sites; exact cv2 bit-parity is NOT claimed for the
pixel ops (the oracle and the engine share these implementations, and
reference parity is asserted at the *feature* level via the golden blob
rows — see ``functions/blobs.py``).

- ``pad_box``            -> ``data_extraction_functions/final_run_ocr.py:83-90``
- ``otsu_threshold``     -> cv2.THRESH_OTSU as used in ``hybrid.py:181``
- ``binary_open/close``  -> ``hybrid.py:183-186`` (2x2 / 3x3 ellipse kernels)
- ``connected_components``-> cv2.connectedComponentsWithStats(8) in ``hybrid.py:190``
- ``convex_hull_area``   -> cv2.convexHull + contourArea in ``hybrid.py:211-216``
- ``extract_smart_blobs``-> ``hybrid.py:189-227`` (filters + per-blob stats)
- ``create_text_mask``   -> ``hybrid.py:172-187``
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# cv2.getStructuringElement(MORPH_ELLIPSE, (2, 2)) == all-ones 2x2;
# (3, 3) ellipse == a cross.
KERNEL_2X2 = np.ones((2, 2), dtype=bool)
KERNEL_3X3_ELLIPSE = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)


def pad_box(xyxy: Sequence[float], img_w: int, img_h: int,
            pad: float = 0.08) -> List[int]:
    x1, y1, x2, y2 = xyxy
    w, h = x2 - x1, y2 - y1
    return [max(0, int(x1 - pad * w)), max(0, int(y1 - pad * h)),
            min(img_w, int(x2 + pad * w)), min(img_h, int(y2 + pad * h))]


def otsu_threshold(gray: np.ndarray) -> Tuple[int, np.ndarray]:
    """Standard Otsu over a uint8 image; returns (threshold, mask 0/255)
    with the cv2 convention mask = 255 where pixel > threshold."""
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0, np.zeros_like(gray)
    omega = np.cumsum(hist)
    mu = np.cumsum(hist * np.arange(256))
    mu_t = mu[-1]
    w0 = omega
    w1 = total - omega
    valid = (w0 > 0) & (w1 > 0)
    between = np.zeros(256)
    between[valid] = (mu_t * w0[valid] - mu[valid] * total) ** 2 / (
        w0[valid] * w1[valid] * total * total)
    t = int(np.argmax(between))
    return t, np.where(gray > t, 255, 0).astype(np.uint8)


def _binary_dilate(mask: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    kh, kw = kernel.shape
    # anchor at kernel center, cv2 default: center = (kh//2, kw//2)
    ah, aw = kh // 2, kw // 2
    out = np.zeros_like(mask, dtype=bool)
    m = mask.astype(bool)
    H, W = mask.shape
    for di in range(kh):
        for dj in range(kw):
            if not kernel[di, dj]:
                continue
            oi, oj = di - ah, dj - aw
            src = m[max(0, -oi):H - max(0, oi) or H, max(0, -oj):W - max(0, oj) or W]
            out[max(0, oi):H - max(0, -oi) or H, max(0, oj):W - max(0, -oj) or W] |= src
    return out


def _binary_erode(mask: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    kh, kw = kernel.shape
    ah, aw = kh // 2, kw // 2
    out = np.ones_like(mask, dtype=bool)
    m = mask.astype(bool)
    H, W = mask.shape
    padded = np.zeros((H + kh, W + kw), dtype=bool)
    padded[ah:ah + H, aw:aw + W] = m
    for di in range(kh):
        for dj in range(kw):
            if kernel[di, dj]:
                out &= padded[di:di + H, dj:dj + W]
    return out


def binary_open(mask: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    return (_binary_dilate(_binary_erode(mask > 0, kernel), kernel)
            .astype(np.uint8) * 255)


def binary_close(mask: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    return (_binary_erode(_binary_dilate(mask > 0, kernel), kernel)
            .astype(np.uint8) * 255)


def create_text_mask(roi_gray: np.ndarray,
                     use_image_as_mask: bool = False) -> Tuple[np.ndarray, Dict]:
    """Otsu + open(2x2) + close(3x3 ellipse); disabled -> zeros
    (``hybrid.py:172-187``)."""
    H, W = roi_gray.shape[:2]
    if not use_image_as_mask:
        return np.zeros((H, W), dtype=np.uint8), {
            "method": "disabled", "foreground_ratio": 0.0}
    _, mask = otsu_threshold(roi_gray)
    mask = binary_open(mask, KERNEL_2X2)
    mask = binary_close(mask, KERNEL_3X3_ELLIPSE)
    fg_ratio = float(np.count_nonzero(mask)) / float(H * W if H * W else 1)
    return mask, {"method": "image_as_mask", "foreground_ratio": fg_ratio}


def connected_components(mask: np.ndarray):
    """8-connected components with stats over a 0/255 mask.

    Returns (num_labels, labels, stats, centroids) shaped like
    cv2.connectedComponentsWithStats: label 0 = background; stats rows
    are (x, y, w, h, area); centroids are (cx, cy) pixel means.
    Two-pass row-run labeling with union-find.
    """
    m = mask > 0
    H, W = m.shape
    labels = np.zeros((H, W), dtype=np.int32)
    parent = [0]  # parent[i] for union-find; 0 = background sentinel

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    next_label = 1
    prev_runs: List[Tuple[int, int, int]] = []  # (start, end, label) of row above
    for i in range(H):
        row = m[i]
        runs = []
        j = 0
        idx = np.flatnonzero(row)
        if idx.size:
            # split into consecutive runs
            breaks = np.flatnonzero(np.diff(idx) > 1)
            starts = np.concatenate(([0], breaks + 1))
            ends = np.concatenate((breaks, [idx.size - 1]))
            for s, e in zip(starts, ends):
                a, b = int(idx[s]), int(idx[e])
                # 8-connectivity: overlap window [a-1, b+1] with row above
                label = 0
                for (pa, pb, pl) in prev_runs:
                    if pa <= b + 1 and pb >= a - 1:
                        if label == 0:
                            label = find(pl)
                        else:
                            union(label, pl)
                if label == 0:
                    label = next_label
                    parent.append(label)
                    next_label += 1
                labels[i, a:b + 1] = label
                runs.append((a, b, label))
        prev_runs = runs

    if next_label == 1:
        return 1, labels, np.array([[0, 0, W, H, H * W]], dtype=np.int64), \
            np.array([[(W - 1) / 2.0, (H - 1) / 2.0]])

    # flatten unions and renumber densely
    roots = np.array([find(l) for l in range(next_label)], dtype=np.int32)
    uniq = np.unique(roots[1:])
    remap = np.zeros(next_label, dtype=np.int32)
    remap[uniq] = np.arange(1, uniq.size + 1)
    labels = remap[roots[labels]]
    n = uniq.size + 1

    stats = np.zeros((n, 5), dtype=np.int64)
    centroids = np.zeros((n, 2), dtype=np.float64)
    ys, xs = np.nonzero(labels)
    ls = labels[ys, xs]
    for lab in range(1, n):
        sel = ls == lab
        bx, by = xs[sel], ys[sel]
        x0, x1 = bx.min(), bx.max()
        y0, y1 = by.min(), by.max()
        stats[lab] = (x0, y0, x1 - x0 + 1, y1 - y0 + 1, sel.sum())
        centroids[lab] = (bx.mean(), by.mean())
    # background stats
    bg = ~m
    stats[0] = (0, 0, W, H, int(bg.sum()))
    if bg.any():
        bys, bxs = np.nonzero(bg)
        centroids[0] = (bxs.mean(), bys.mean())
    return n, labels, stats, centroids


def convex_hull_area(points: np.ndarray) -> float:
    """Area of the convex hull of integer pixel coordinates (x, y) via
    monotone chain + shoelace, matching cv2.contourArea-over-hull
    closely enough for the solidity filter band."""
    pts = np.unique(points, axis=0)
    if len(pts) < 3:
        return 0.0
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: List = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: List = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = np.array(lower[:-1] + upper[:-1], dtype=np.float64)
    x, y = hull[:, 0], hull[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def extract_smart_blobs(mask: np.ndarray, min_area: float = 30.0) -> List[Dict]:
    """Blob extraction with the reference's exact filter band
    (``hybrid.py:189-227``): area >= min_area, w,h >= 3, area <= 10% of
    ROI, 0.02 <= aspect <= 50, solidity >= 0.05, extent >= 0.05."""
    num_labels, labels, stats, centroids = connected_components(mask)
    blobs: List[Dict] = []
    H, W = mask.shape[:2]
    roi_area = float(H * W) if H and W else 1.0
    for i in range(1, num_labels):
        x, y, w, h, area = (int(v) for v in stats[i])
        if area < min_area or w < 3 or h < 3:
            continue
        if area > 0.1 * roi_area:
            continue
        cx, cy = centroids[i]
        ar = w / h if h > 0 else 0.0
        ys, xs = np.nonzero(labels == i)
        hull_area = convex_hull_area(np.stack([xs, ys], axis=1))
        solidity = float(area) / hull_area if hull_area > 0 else 0.5
        extent = float(area) / float(w * h) if (w * h) > 0 else 0.0
        if (0.02 <= ar <= 50.0) and (solidity >= 0.05) and (extent >= 0.05):
            blobs.append({
                "x": x, "y": y, "w": w, "h": h,
                "cx": float(cx), "cy": float(cy),
                "area": float(area),
                "aspect_ratio": float(ar),
                "solidity": float(solidity),
                "extent": float(extent),
            })
    return blobs
