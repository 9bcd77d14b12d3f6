"""Image preprocessing ops for the media leg (numpy ports of the
reference's cv2 chains; exact cv2 bit-parity is NOT claimed — the
formulas and parameters follow the cited call sites, and pipeline/
oracle share these implementations).

- ``canny``/``edge_map`` -> ``Photo_Stitch.py:169-176`` (full Canny
  chain: Sobel, L1 magnitude, NMS, CC-based hysteresis; + 2x2 dilate)
- ``bilateral_filter``-> cv2.bilateralFilter(7, 50, 50)
  ``final_run_ocr.py:96`` (vectorized shifted-window passes)
- ``clahe``           -> cv2.createCLAHE(2.0, 8x8) in
  ``final_run_ocr.py:94`` / ``Char_Count_TurnTable.py:63`` (full cv2
  algorithm: integer clip + stepped residual redistribution + bilinear
  tile-LUT interpolation)
- ``unsharp``         -> addWeighted(g,1.5,blur,-0.5) ``final_run_ocr.py:100-101``
- ``adaptive_threshold`` -> adaptiveThreshold(GAUSSIAN, 31, 7)
  ``final_run_ocr.py:102-104``
- ``enhance_for_ocr`` -> ``_enhance_for_ocr`` chain ``final_run_ocr.py:92-105``
  (INTER_CUBIC upscale via imaging.resize_bicubic, A=-0.75 kernel)
- ``rotate_nearest``  -> imutils.rotate equivalent used by alignment
  (``hybrid.py:148-170``)
- ``find_label_roi``  -> ``hybrid.py:102-146`` scoring heuristic
- ``align_vertically``-> ``hybrid.py:148-170`` rotation search
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from .imaging import (KERNEL_2X2, _binary_dilate, binary_close,
                      connected_components, otsu_threshold)


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(gray: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Separable gaussian blur with reflect padding."""
    radius = max(1, int(3 * sigma + 0.5))
    k = _gaussian_kernel1d(sigma, radius)
    img = gray.astype(np.float64)
    padded = np.pad(img, ((radius, radius), (0, 0)), mode="reflect")
    img = sum(k[i] * padded[i:i + gray.shape[0]] for i in range(len(k)))
    padded = np.pad(img, ((0, 0), (radius, radius)), mode="reflect")
    img = sum(k[i] * padded[:, i:i + gray.shape[1]] for i in range(len(k)))
    return img


def bilateral_filter(gray: np.ndarray, d: int = 7,
                     sigma_color: float = 50.0,
                     sigma_space: float = 50.0) -> np.ndarray:
    """Edge-preserving bilateral filter (cv2.bilateralFilter(d=7,
    sigmaColor=50, sigmaSpace=50) in ``final_run_ocr.py:96``): each
    output pixel is the window average weighted by BOTH spatial
    distance and intensity difference, so edges stay sharp while flat
    regions smooth. Vectorized as d*d shifted-window passes (49 for
    d=7) — no per-pixel Python."""
    r = d // 2
    g = gray.astype(np.float64)
    h, w = g.shape
    padded = np.pad(g, r, mode="reflect")
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    space_w = np.exp(-(xs * xs + ys * ys) /
                     (2.0 * sigma_space * sigma_space))
    num = np.zeros_like(g)
    den = np.zeros_like(g)
    inv2sc = 1.0 / (2.0 * sigma_color * sigma_color)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = padded[r + dy:r + dy + h, r + dx:r + dx + w]
            diff = shifted - g
            wgt = space_w[dy + r, dx + r] * np.exp(-diff * diff * inv2sc)
            num += wgt * shifted
            den += wgt
    return np.clip(num / den, 0, 255).astype(np.uint8)


def _sobel(g: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """3x3 Sobel gradients with reflect padding (cv2 aperture 3)."""
    p = np.pad(g, 1, mode="reflect")
    h, w = g.shape
    # horizontal derivative: smooth vertically [1,2,1], diff horizontally
    gx = ((p[0:h, 2:] + 2 * p[1:h + 1, 2:] + p[2:, 2:]) -
          (p[0:h, 0:w] + 2 * p[1:h + 1, 0:w] + p[2:, 0:w]))
    gy = ((p[2:, 0:w] + 2 * p[2:, 1:w + 1] + p[2:, 2:]) -
          (p[0:h, 0:w] + 2 * p[0:h, 1:w + 1] + p[0:h, 2:]))
    return gx, gy


def canny(gray: np.ndarray, lo: float = 50.0,
          hi: float = 150.0) -> np.ndarray:
    """Full Canny chain (cv2.Canny(g, 50, 150) in
    ``Photo_Stitch.py:172``; exact cv2 bit-parity not claimed): 3x3
    Sobel, L1 gradient magnitude (cv2's default L2gradient=False),
    4-sector non-maximum suppression, and double-threshold hysteresis
    — weak edges survive only in 8-connected components that contain
    a strong edge (hysteresis via the repo's vectorized
    connected-components labeling, not pixel BFS)."""
    g = gray.astype(np.float64)
    gx, gy = _sobel(g)
    mag = np.abs(gx) + np.abs(gy)

    # quantize gradient direction to 0/45/90/135 sectors and compare
    # against the two neighbors along the gradient
    angle = np.rad2deg(np.arctan2(gy, gx)) % 180.0
    sector = np.zeros(g.shape, dtype=np.int8)
    sector[(angle >= 22.5) & (angle < 67.5)] = 1
    sector[(angle >= 67.5) & (angle < 112.5)] = 2
    sector[(angle >= 112.5) & (angle < 157.5)] = 3
    p = np.pad(mag, 1, mode="constant")
    h, w = g.shape
    # With gy positive downward (image coords), a 45-degree gradient
    # angle lies along the main (NW/SE) pixel diagonal and 135 degrees
    # along the anti-diagonal (NE/SW) — sectors 1 and 3 must compare
    # the neighbors ALONG the gradient, i.e. across the edge.
    nb = {
        0: (p[1:h + 1, 2:], p[1:h + 1, 0:w]),      # E / W
        1: (p[0:h, 0:w], p[2:, 2:]),               # NW / SE
        2: (p[0:h, 1:w + 1], p[2:, 1:w + 1]),      # N / S
        3: (p[0:h, 2:], p[2:, 0:w]),               # NE / SW
    }
    keep = np.zeros(g.shape, dtype=bool)
    for s, (a, b) in nb.items():
        m = sector == s
        keep |= m & (mag >= a) & (mag >= b)
    nms = np.where(keep, mag, 0.0)

    strong = nms >= hi
    weak = nms >= lo
    if not strong.any():
        return np.zeros(g.shape, dtype=np.uint8)
    _, labels, _, _ = connected_components(weak.astype(np.uint8) * 255)
    strong_labels = np.unique(labels[strong])
    strong_labels = strong_labels[strong_labels > 0]
    out = np.isin(labels, strong_labels)
    return out.astype(np.uint8) * 255


def edge_map(gray: np.ndarray, lo: float = 50.0,
             hi: float = 150.0) -> np.ndarray:
    """The reference's host-side edge map (``Photo_Stitch.py:169-176``):
    Canny(50, 150) + 2x2 dilate for connectivity."""
    edges = canny(gray, lo, hi) > 0
    return _binary_dilate(edges, KERNEL_2X2).astype(np.uint8) * 255


def _reflect101_indices(n: int, total: int) -> np.ndarray:
    """BORDER_REFLECT_101 source index for positions 0..total-1 over an
    axis of length n (cv2 copyMakeBorder semantics, any pad width)."""
    if n == 1:
        return np.zeros(total, dtype=np.int64)
    idx = np.arange(total, dtype=np.int64) % (2 * (n - 1))
    return np.where(idx >= n, 2 * (n - 1) - idx, idx)


def clahe(gray: np.ndarray, clip_limit: float = 2.0,
          tiles: Tuple[int, int] = (8, 8)) -> np.ndarray:
    """CLAHE with cv2 semantics (cv2.createCLAHE(clipLimit, tileGrid),
    imgproc/clahe.cpp): reflect-101 pad to a tile-divisible size,
    per-tile histogram with INTEGER clip = max(int(clip*area/256), 1),
    cv2's exact excess redistribution (uniform batch + the stepped
    residual loop), per-tile LUT = round(cdf * 255/area), then each
    OUTPUT pixel bilinearly interpolates the 4 neighboring tile LUTs
    (tile-center mapping, edge-clamped) — no tile seams."""
    H, W = gray.shape
    ty_n, tx_n = int(tiles[0]), int(tiles[1])
    th = -(-H // ty_n)  # ceil
    tw = -(-W // tx_n)
    if (th * ty_n, tw * tx_n) != (H, W):
        padded = gray[np.ix_(_reflect101_indices(H, th * ty_n),
                             _reflect101_indices(W, tw * tx_n))]
    else:
        padded = gray
    area = th * tw
    # per-tile histograms in one bincount (offset trick)
    t = (padded.reshape(ty_n, th, tx_n, tw).transpose(0, 2, 1, 3)
               .reshape(ty_n * tx_n, area).astype(np.int64))
    hist = np.bincount(
        (t + np.arange(ty_n * tx_n)[:, None] * 256).reshape(-1),
        minlength=ty_n * tx_n * 256).reshape(ty_n * tx_n, 256)
    clip = max(int(clip_limit * area / 256.0), 1)
    clipped = np.maximum(hist - clip, 0).sum(axis=1)
    hist = np.minimum(hist, clip)
    hist += (clipped // 256)[:, None]
    residual = clipped % 256
    for k in np.flatnonzero(residual):  # <=256 increments per tile
        r = int(residual[k])
        step = max(256 // r, 1)
        hist[k, 0:r * step:step] += 1
    lut = np.clip(np.round(hist.cumsum(axis=1) * (255.0 / area)),
                  0, 255).astype(np.uint8).reshape(ty_n, tx_n, 256)

    # bilinear tile interpolation over the ORIGINAL image
    txf = np.arange(W, dtype=np.float64) / tw - 0.5
    tx1 = np.floor(txf).astype(np.int64)
    xa = (txf - tx1)[None, :]
    tx1c = np.clip(tx1, 0, tx_n - 1)
    tx2c = np.clip(tx1 + 1, 0, tx_n - 1)
    tyf = np.arange(H, dtype=np.float64) / th - 0.5
    ty1 = np.floor(tyf).astype(np.int64)
    ya = (tyf - ty1)[:, None]
    ty1c = np.clip(ty1, 0, ty_n - 1)
    ty2c = np.clip(ty1 + 1, 0, ty_n - 1)

    v = gray.astype(np.int64)
    l11 = lut[ty1c[:, None], tx1c[None, :], v].astype(np.float64)
    l12 = lut[ty1c[:, None], tx2c[None, :], v].astype(np.float64)
    l21 = lut[ty2c[:, None], tx1c[None, :], v].astype(np.float64)
    l22 = lut[ty2c[:, None], tx2c[None, :], v].astype(np.float64)
    res = (l11 * (1 - xa) * (1 - ya) + l12 * xa * (1 - ya)
           + l21 * (1 - xa) * ya + l22 * xa * ya)
    return np.clip(np.round(res), 0, 255).astype(np.uint8)


def unsharp(gray: np.ndarray, sigma: float = 1.0, amount: float = 1.5,
            sub: float = 0.5) -> np.ndarray:
    blur = gaussian_blur(gray, sigma)
    sharp = amount * gray.astype(np.float64) - sub * blur
    return np.clip(sharp, 0, 255).astype(np.uint8)


def adaptive_threshold(gray: np.ndarray, block: int = 31,
                       c: float = 7.0) -> np.ndarray:
    """Gaussian-weighted adaptive threshold -> 0/255."""
    sigma = 0.3 * ((block - 1) * 0.5 - 1) + 0.8  # cv2's sigma heuristic
    mean = gaussian_blur(gray, sigma)
    return np.where(gray.astype(np.float64) > mean - c, 255, 0).astype(
        np.uint8)


def enhance_for_ocr(gray: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """The M2 chain (final_run_ocr.py:92-105): CLAHE -> smooth ->
    2x upscale if small -> unsharp -> adaptive threshold. Returns
    (sharp, binarized)."""
    g = clahe(gray, 2.0, (8, 8))
    g = bilateral_filter(g, 7, 50.0, 50.0)
    h, w = g.shape
    if max(h, w) < 250:
        from .imaging import resize_bicubic
        g = resize_bicubic(g, h * 2, w * 2)  # cv2 INTER_CUBIC, :99
    sharp = unsharp(g, 1.0, 1.5, 0.5)
    binar = adaptive_threshold(sharp, 31, 7.0)
    return sharp, binar


def turntable_preprocess(gray: np.ndarray) -> np.ndarray:
    """The M24 turntable OCR preprocess (``Char_Count_TurnTable.py:62-70``)
    — distinct from the M2 chain: CLAHE(2.0, 8x8) -> gaussian adaptive
    threshold with block=35, C=15 -> one 2x2 morphological CLOSE pass.
    Returns the 0/255 binarized frame fed to the char-count OCR."""
    g = clahe(gray, 2.0, (8, 8))
    th = adaptive_threshold(g, 35, 15.0)
    closed = binary_close(th > 0, KERNEL_2X2)
    return (closed > 0).astype(np.uint8) * 255


def rotate_nearest(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate about the center, same output size, nearest-neighbor,
    zeros outside (imutils.rotate semantics)."""
    if angle_deg % 360 == 0:
        return img.copy()
    H, W = img.shape[:2]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    theta = math.radians(angle_deg)
    cos, sin = math.cos(theta), math.sin(theta)
    ys, xs = np.mgrid[0:H, 0:W]
    # inverse mapping: output (x,y) <- input coords
    xr = (xs - cx) * cos - (ys - cy) * sin + cx
    yr = (xs - cx) * sin + (ys - cy) * cos + cy
    xi = np.round(xr).astype(np.int64)
    yi = np.round(yr).astype(np.int64)
    valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    out = np.zeros_like(img)
    out[ys[valid], xs[valid]] = img[yi[valid], xi[valid]]
    return out


def find_label_roi(gray: np.ndarray) -> Tuple[int, int, int, int]:
    """Label-ROI heuristic (hybrid.py:102-146): edge components scored
    by 0.4*centrality + 0.3*relative-area + 0.3*min(var/1000, 1) over
    candidate boxes with 10-90% area and aspect 0.2-5; fallback = 10%
    margin box. Inputs with max side > 800 px are downscaled first
    (``scale = 800 / max(H, W)``, hybrid.py:106-109) — scoring runs on
    the small frame and the winning box is rescaled by 1/scale and
    clamped to the original frame (hybrid.py:144-146). Camera frames
    hit this leg on every capture; omitting it silently changes ROI
    scoring on large inputs."""
    H0, W0 = gray.shape[:2]
    scale = min(1.0, 800.0 / max(H0, W0))
    if scale < 1.0:
        from .imaging import resize_bilinear
        # extreme aspect ratios (1xN strips) would truncate a side to
        # zero and crash edge_map — clamp to 1 px
        small = resize_bilinear(gray, max(1, int(H0 * scale)),
                                max(1, int(W0 * scale)))
    else:
        small = gray
    H, W = small.shape[:2]
    gray = small
    edges = edge_map(gray)
    n, labels, stats, _ = connected_components(edges)
    best_box, best_score = None, -1.0
    area_img = W * H
    for i in range(1, n):
        x, y, cw, ch = (int(v) for v in stats[i][:4])
        area = cw * ch
        if area < 0.1 * area_img or area > 0.9 * area_img:
            continue
        ar = cw / ch if ch else 0.0
        if ar < 0.2 or ar > 5.0:
            continue
        ccx, ccy = (x + cw / 2) / W, (y + ch / 2) / H
        center_score = 1.0 - (abs(ccx - 0.5) + abs(ccy - 0.5))
        size_score = area / area_img
        roi = gray[y:y + ch, x:x + cw]
        content_score = min(1.0, float(np.var(roi)) / 1000.0)
        score = center_score * 0.4 + size_score * 0.3 + content_score * 0.3
        if score > best_score:
            best_score = score
            best_box = (x, y, x + cw, y + ch)
    if best_box is None:
        mw, mh = int(W * 0.1), int(H * 0.1)
        best_box = (mw, mh, W - mw, H - mh)
    if scale < 1.0:
        # rescale the small-frame box back to original coordinates
        # (hybrid.py:144-146: int-truncated, clamped to the frame)
        inv = 1.0 / scale
        x1, y1, x2, y2 = best_box
        best_box = (max(0, int(x1 * inv)), max(0, int(y1 * inv)),
                    min(W0, int(x2 * inv)), min(H0, int(y2 * inv)))
    return best_box


def find_label_roi_with_detections(gray: np.ndarray, detections,
                                   conf_threshold: float = 0.8,
                                   pad: int = 10
                                   ) -> Tuple[int, int, int, int]:
    """M16 (``hybrid.py:66-99``): detector-supplied ROI override — the
    best detection box at or above the confidence threshold, grown by a
    fixed 10px pad and clamped to the frame; falls back to the M15
    heuristic when no detection qualifies."""
    H, W = gray.shape[:2]
    best_box, best_conf = None, 0.0
    for det in detections or []:
        conf = float(det.get("confidence", 0.0))
        if conf >= conf_threshold and conf > best_conf:
            best_conf = conf
            best_box = det["box"]
    if best_box is not None:
        x1, y1, x2, y2 = (int(v) for v in best_box)
        return (max(0, x1 - pad), max(0, y1 - pad),
                min(W, x2 + pad), min(H, y2 + pad))
    return find_label_roi(gray)


def align_vertically(gray: np.ndarray) -> Tuple[np.ndarray, float]:
    """Rotation search maximizing empty columns of the Otsu-binarized
    image (hybrid.py:148-170): probe +1 degree to pick the sweep
    direction, then argmax over 0..±45."""
    _, binary = otsu_threshold(gray)

    def score(img: np.ndarray) -> int:
        return img.shape[1] - int(np.count_nonzero(img.sum(axis=0)))

    initial = score(binary)
    pos = score(rotate_nearest(binary, 1))
    rng = range(0, 45) if pos > initial else range(0, -45, -1)
    degrees, scores = [], []
    for deg in rng:
        degrees.append(deg)
        scores.append(score(rotate_nearest(binary, deg)))
    best = degrees[int(np.argmax(scores))]
    return rotate_nearest(gray, best), float(best)


# -------------------------------------------------- M21 sweep fan-out

# The vintage fallback sweep's image-side enumeration
# (``final_run_ocr.py:187-297``): 5 preprocess versions x 5 search
# regions x [unrotated, -5 deg, +5 deg] = 75 OCR variants worst case.
SWEEP_ANGLES: Tuple[float, ...] = (0.0, -5.0, 5.0)


def sweep_preprocess_versions(gray: np.ndarray):
    """The sweep's 5 preprocess variants (``final_run_ocr.py:193-233``)
    adapted to this engine's single-channel images (the reference's
    red-channel ops act on BGR; their intensity effect is reproduced,
    the hue selection is meaningless on grayscale by construction):

    - ``original``      identity
    - ``red_enhanced``  intensity x1.5 clip (the r*1.5 merge as seen
                        by a gray read of the result)
    - ``red_mask``      bright-band inRange(30..255) mask, dilated
                        3x3 twice, applied as bitwise_and
    - ``high_contrast`` CLAHE clip=3.0, 8x8 tiles (exact counterpart)
    - ``sharpened``     addWeighted(img, 2.0, blur(sigma=1), -1.0)

    Yields ``(name, processed)`` in the reference's order.
    """
    yield "original", gray
    yield "red_enhanced", np.clip(
        gray.astype(np.float64) * 1.5, 0, 255).astype(np.uint8)
    band = (gray >= 30).astype(np.uint8)
    band = _binary_dilate(band, np.ones((3, 3), dtype=bool))
    band = _binary_dilate(band, np.ones((3, 3), dtype=bool))
    yield "red_mask", (gray * band).astype(np.uint8)
    yield "high_contrast", clahe(gray, clip_limit=3.0, tiles=(8, 8))
    blurred = gaussian_blur(gray, 1.0)
    yield "sharpened", np.clip(
        2.0 * gray.astype(np.float64) - blurred, 0, 255).astype(np.uint8)


def sweep_regions(w: int, h: int):
    """The sweep's 5 search regions (``final_run_ocr.py:239-249``):
    full image, top half, middle band, left third, right third."""
    return [("full", (0, 0, w, h)),
            ("top_half", (0, 0, w, h // 2)),
            ("middle_band", (0, h // 3, w, 2 * h // 3)),
            ("left_third", (0, 0, w // 3, h)),
            ("right_third", (2 * w // 3, 0, w, h))]


def sweep_variant_crops(gray: np.ndarray, max_variants: int = 75):
    """Enumerate the sweep's OCR inputs in the reference's exact
    nesting order (versions outer, regions middle, [unrotated, -5,
    +5] inner — ``final_run_ocr.py:236-272``), yielding
    ``(version, region, angle, crop)`` and stopping hard at
    ``max_variants`` (the PipelineConfig.sweep_max_variants cost cap;
    the reference's worst case is the full 75)."""
    n = 0
    h, w = gray.shape[:2]
    for vname, proc in sweep_preprocess_versions(gray):
        for rname, (x1, y1, x2, y2) in sweep_regions(w, h):
            crop = proc[y1:y2, x1:x2]
            if crop.size == 0:
                continue
            for angle in SWEEP_ANGLES:
                if n >= max_variants:
                    return
                out = crop if angle == 0.0 else rotate_nearest(crop, angle)
                yield vname, rname, angle, out
                n += 1
