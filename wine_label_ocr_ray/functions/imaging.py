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


def _label_runs(m: np.ndarray):
    """Extract foreground runs of every row in one vectorized pass and
    label them with 8-connectivity union-find. Returns
    (runs_r, runs_a, runs_b, run_root_labels, next_label) where run k
    spans columns [a, b] of row r."""
    H, W = m.shape
    padded = np.zeros((H, W + 2), dtype=np.int8)
    padded[:, 1:-1] = m
    d = np.diff(padded, axis=1)
    sr, sc = np.nonzero(d == 1)      # run starts (inclusive)
    er, ec = np.nonzero(d == -1)     # run ends (exclusive)
    # starts/ends are row-major aligned pairs
    runs_r, runs_a, runs_b = sr, sc, ec - 1

    parent = np.arange(len(runs_r) + 1, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    labels_of_run = np.zeros(len(runs_r), dtype=np.int64)
    next_label = 1
    prev_start = prev_stop = 0  # slice of runs in previous row
    row_of = runs_r
    i = 0
    nruns = len(runs_r)
    while i < nruns:
        r = row_of[i]
        j = i
        while j < nruns and row_of[j] == r:
            j += 1
        # previous row's runs: [prev_start, prev_stop) valid iff that
        # row is r-1
        if prev_stop > prev_start and row_of[prev_start] != r - 1:
            prev_start = prev_stop = i
        # two-pointer over the (sorted) previous row's runs: both run
        # lists are ascending, so the overlap window only moves forward
        p_lo = prev_start
        for k in range(i, j):
            a, b = runs_a[k], runs_b[k]
            while p_lo < prev_stop and runs_b[p_lo] < a - 1:
                p_lo += 1
            label = 0
            p = p_lo
            while p < prev_stop and runs_a[p] <= b + 1:
                root = find(labels_of_run[p])
                if label == 0:
                    label = root
                elif root != label:
                    ra, rb = find(label), root
                    if ra < rb:
                        parent[rb] = ra
                        label = ra
                    else:
                        parent[ra] = rb
                        label = rb
                p += 1
            if label == 0:
                label = next_label
                next_label += 1
            labels_of_run[k] = label
        prev_start, prev_stop = i, j
        i = j
    roots = np.array([find(int(l)) for l in labels_of_run], dtype=np.int64)
    return runs_r, runs_a, runs_b, roots, next_label


def connected_components(mask: np.ndarray):
    """8-connected components with stats over a 0/255 mask.

    Returns (num_labels, labels, stats, centroids) shaped like
    cv2.connectedComponentsWithStats: label 0 = background; stats rows
    are (x, y, w, h, area); centroids are (cx, cy) pixel means.
    Run-based two-pass labeling with union-find (vectorized run
    extraction; Python only over runs, not pixels or rows).
    """
    m = mask > 0
    H, W = m.shape
    labels = np.zeros((H, W), dtype=np.int32)
    runs_r, runs_a, runs_b, roots, next_label = _label_runs(m)

    if len(runs_r) == 0:
        return 1, labels, np.array([[0, 0, W, H, H * W]], dtype=np.int64), \
            np.array([[(W - 1) / 2.0, (H - 1) / 2.0]])

    uniq, dense = np.unique(roots, return_inverse=True)
    dense = dense + 1  # labels 1..n-1
    n = len(uniq) + 1

    run_len = (runs_b - runs_a + 1).astype(np.int64)
    stats = np.zeros((n, 5), dtype=np.int64)
    centroids = np.zeros((n, 2), dtype=np.float64)
    x0 = np.full(n, np.iinfo(np.int64).max)
    x1 = np.full(n, -1, dtype=np.int64)
    y0 = np.full(n, np.iinfo(np.int64).max)
    y1 = np.full(n, -1, dtype=np.int64)
    area = np.zeros(n, dtype=np.int64)
    sx = np.zeros(n, dtype=np.float64)
    sy = np.zeros(n, dtype=np.float64)
    np.minimum.at(x0, dense, runs_a)
    np.maximum.at(x1, dense, runs_b)
    np.minimum.at(y0, dense, runs_r)
    np.maximum.at(y1, dense, runs_r)
    np.add.at(area, dense, run_len)
    # sum of x over a run [a,b] = (a+b)*(b-a+1)/2
    np.add.at(sx, dense, (runs_a + runs_b) * run_len / 2.0)
    np.add.at(sy, dense, runs_r.astype(np.float64) * run_len)
    for k in range(len(runs_r)):
        labels[runs_r[k], runs_a[k]:runs_b[k] + 1] = dense[k]
    stats[1:, 0] = x0[1:]
    stats[1:, 1] = y0[1:]
    stats[1:, 2] = x1[1:] - x0[1:] + 1
    stats[1:, 3] = y1[1:] - y0[1:] + 1
    stats[1:, 4] = area[1:]
    centroids[1:, 0] = sx[1:] / area[1:]
    centroids[1:, 1] = sy[1:] / area[1:]
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
    arr = np.asarray(points)
    # tolist() yields Python ints for integer arrays — identical
    # tuples to the former per-point int() casts, far cheaper
    pts = sorted(set(zip(arr[:, 0].tolist(), arr[:, 1].tolist())))
    if len(pts) < 3:
        return 0.0

    lower: List = []
    for px, py in pts:
        while len(lower) >= 2 and \
                ((lower[-1][0] - lower[-2][0]) * (py - lower[-2][1]) -
                 (lower[-1][1] - lower[-2][1]) * (px - lower[-2][0])) <= 0:
            lower.pop()
        lower.append((px, py))
    upper: List = []
    for px, py in reversed(pts):
        while len(upper) >= 2 and \
                ((upper[-1][0] - upper[-2][0]) * (py - upper[-2][1]) -
                 (upper[-1][1] - upper[-2][1]) * (px - upper[-2][0])) <= 0:
            upper.pop()
        upper.append((px, py))
    hull = lower[:-1] + upper[:-1]
    s = 0
    for i in range(len(hull)):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % len(hull)]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def extract_smart_blobs(mask: np.ndarray, min_area: float = 30.0) -> List[Dict]:
    """Blob extraction with the reference's exact filter band
    (``hybrid.py:189-227``): area >= min_area, w,h >= 3, area <= 10% of
    ROI, 0.02 <= aspect <= 50, solidity >= 0.05, extent >= 0.05.

    Works directly on labeled runs; the convex hull uses only each
    blob's per-row extreme pixels (every hull vertex of a pixel set is
    a row-wise x-extreme, so the hull is identical to the all-pixel
    hull at a fraction of the cost).
    """
    H, W = mask.shape[:2]
    roi_area = float(H * W) if H and W else 1.0
    runs_r, runs_a, runs_b, roots, _ = _label_runs(mask > 0)
    blobs: List[Dict] = []
    if len(runs_r) == 0:
        return blobs
    uniq, dense = np.unique(roots, return_inverse=True)
    n = len(uniq)
    run_len = (runs_b - runs_a + 1).astype(np.int64)
    # per-blob bbox/area/moment stats in one scatter pass over runs
    # (was a Python loop of small numpy reductions per blob — ~34
    # blobs x 6 kernel launches per payload in the flagship's hottest
    # stage). Integer accumulators keep every later float IDENTICAL
    # to the per-blob form: same integer sums, same division order.
    x0 = np.full(n, np.iinfo(np.int64).max)
    x1 = np.full(n, -1, dtype=np.int64)
    y0 = np.full(n, np.iinfo(np.int64).max)
    y1 = np.full(n, -1, dtype=np.int64)
    area_v = np.zeros(n, dtype=np.int64)
    sx2 = np.zeros(n, dtype=np.int64)   # sum over runs of (a+b)*len
    sy = np.zeros(n, dtype=np.int64)    # sum over runs of r*len
    np.minimum.at(x0, dense, runs_a)
    np.maximum.at(x1, dense, runs_b)
    np.minimum.at(y0, dense, runs_r)
    np.maximum.at(y1, dense, runs_r)
    np.add.at(area_v, dense, run_len)
    np.add.at(sx2, dense, (runs_a + runs_b) * run_len)
    np.add.at(sy, dense, runs_r * run_len)
    w_v = x1 - x0 + 1
    h_v = y1 - y0 + 1
    # cheap filter band applied vectorized; the hull (the only
    # per-blob cost left) runs only for survivors
    keep = ((area_v >= min_area) & (w_v >= 3) & (h_v >= 3)
            & (area_v <= 0.1 * roi_area))
    if not keep.any():
        return blobs
    order = np.argsort(dense, kind="stable")
    bounds = np.searchsorted(dense[order], np.arange(n + 1))
    for bi in np.flatnonzero(keep):
        area = int(area_v[bi])
        x0b, y0b = int(x0[bi]), int(y0[bi])
        w, h = int(w_v[bi]), int(h_v[bi])
        cx = float(sx2[bi] / 2.0 / area)
        cy = float(sy[bi] / area)
        ar = w / h if h > 0 else 0.0
        if area == w * h and w > 1 and h > 1:
            # exact rectangle: hull is its 4 pixel-center corners
            hull_area = float((w - 1) * (h - 1))
        else:
            # hull points: per-row leftmost and rightmost pixels
            sel = order[bounds[bi]:bounds[bi + 1]]
            rr, ra, rb = runs_r[sel], runs_a[sel], runs_b[sel]
            pts = np.concatenate([np.stack([ra, rr], axis=1),
                                  np.stack([rb, rr], axis=1)])
            hull_area = convex_hull_area(pts)
        solidity = float(area) / hull_area if hull_area > 0 else 0.5
        extent = float(area) / float(w * h) if (w * h) > 0 else 0.0
        if (0.02 <= ar <= 50.0) and (solidity >= 0.05) and (extent >= 0.05):
            blobs.append({
                "x": x0b, "y": y0b, "w": w, "h": h,
                "cx": cx, "cy": cy,
                "area": float(area),
                "aspect_ratio": float(ar),
                "solidity": float(solidity),
                "extent": float(extent),
            })
    return blobs


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear resize (cv2 INTER_LINEAR semantics: the
    half-pixel center mapping; used where the reference resizes with
    the default interpolation — Photo_Stitch.py:130,
    final_run_ocr.py:259)."""
    H, W = img.shape[:2]
    if (H, W) == (out_h, out_w):
        return img.copy()
    ys = (np.arange(out_h) + 0.5) * H / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * W / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[y0][:, x0].astype(np.float64)
    b = img[y0][:, x1].astype(np.float64)
    c = img[y1][:, x0].astype(np.float64)
    d = img[y1][:, x1].astype(np.float64)
    out = (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx +
           c * wy * (1 - wx) + d * wy * wx)
    return np.round(out).astype(img.dtype)


def _cubic_coeffs(frac: np.ndarray) -> np.ndarray:
    """cv2's interpolateCubic weights (imgproc/resize: BiCubic kernel
    with A = -0.75) for the 4 taps around each sample, from the
    fractional offsets. Shape: frac.shape + (4,)."""
    A = -0.75
    x = frac
    w = np.empty(x.shape + (4,), dtype=np.float64)
    w[..., 0] = ((A * (x + 1) - 5 * A) * (x + 1) + 8 * A) * (x + 1) - 4 * A
    w[..., 1] = ((A + 2) * x - (A + 3)) * x * x + 1
    w[..., 2] = ((A + 2) * (1 - x) - (A + 3)) * (1 - x) * (1 - x) + 1
    w[..., 3] = 1.0 - w[..., 0] - w[..., 1] - w[..., 2]
    return w


def resize_bicubic(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bicubic resize with cv2 INTER_CUBIC semantics
    (``final_run_ocr.py:99``'s 2x OCR upscale): Catmull-Rom-family
    kernel with A=-0.75, half-pixel center mapping, edge-replicate
    taps, separable row/column passes. Bit-parity with cv2's
    fixed-point inner loop is not claimed; the kernel, taps and
    mapping are exact (pinned against a naive per-pixel evaluation in
    tests/test_imaging.py)."""
    H, W = img.shape[:2]
    if (H, W) == (out_h, out_w):
        return img.copy()
    f = img.astype(np.float64)

    ys = (np.arange(out_h) + 0.5) * H / out_h - 0.5
    y0 = np.floor(ys).astype(np.int64)
    wy = _cubic_coeffs(ys - y0)                      # (out_h, 4)
    rows = np.zeros((out_h, W), dtype=np.float64)
    for i in range(4):
        rows += wy[:, i:i + 1] * f[np.clip(y0 - 1 + i, 0, H - 1)]

    xs = (np.arange(out_w) + 0.5) * W / out_w - 0.5
    x0 = np.floor(xs).astype(np.int64)
    wx = _cubic_coeffs(xs - x0)                      # (out_w, 4)
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for j in range(4):
        out += wx[None, :, j] * rows[:, np.clip(x0 - 1 + j, 0, W - 1)]
    return np.clip(np.round(out), 0, 255).astype(img.dtype)


def stitch_horizontal(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
    """M14 (``Photo_Stitch.py:124-132``): side-by-side stitch with
    matched heights — the right image is rescaled to the left image's
    height (width scaled proportionally, floor like the reference's
    int()), then hstacked."""
    h1 = img1.shape[0]
    h2, w2 = img2.shape[:2]
    if h1 != h2:
        scale = h1 / float(h2 if h2 else 1)
        img2 = resize_bilinear(img2, h1, max(1, int(w2 * scale)))
    return np.hstack((img1, img2))


def choose_bottle_box(detections, *, bottle_class: str = "bottle",
                      conf_threshold: float = 0.4):
    """The T4 bottle-selection law (``Char_Count_TurnTable.py:97-112``):
    among detections of the bottle class at confidence >= 0.40, pick
    the LARGEST-AREA box (strictly greater wins, first seen kept on
    ties). Returns (x1, y1, x2, y2, conf) ints+float, or None. The
    YOLO model itself is a production adapter; this is the data-plane
    selection the guidance loop consumes."""
    best, best_area = None, 0
    for det in detections or []:
        if str(det.get("class", "")).lower() != bottle_class:
            continue
        conf = float(det.get("confidence", 0.0))
        if conf < conf_threshold:
            continue
        x1, y1, x2, y2 = (int(v) for v in det["box"])
        area = max(0, x2 - x1) * max(0, y2 - y1)
        if area > best_area:
            best_area = area
            best = (x1, y1, x2, y2, conf)
    return best


def roi_from_bbox(img_shape, box, *, width_frac: float = 1.0,
                  height_frac: float = 0.9):
    """The M25 ROI law (``Char_Count_TurnTable.py:115-126``): a
    width_frac x height_frac rectangle centered in the bottle box
    (min 10 px per side), clamped to the box. Returns
    (rx1, ry1, rx2, ry2); the caller slices its own image."""
    x1, y1, x2, y2 = (int(v) for v in box[:4])
    w, h = x2 - x1, y2 - y1
    roi_w = int(max(10, width_frac * w))
    roi_h = int(max(10, height_frac * h))
    cx = x1 + w // 2
    rx1 = max(x1, cx - roi_w // 2)
    rx2 = min(x2, cx + roi_w // 2)
    ry1 = max(y1 + (h - roi_h) // 2, y1)
    ry2 = min(ry1 + roi_h, y2)
    del img_shape  # reference clamps to the box, not the frame
    return rx1, ry1, rx2, ry2
