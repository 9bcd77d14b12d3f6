"""Tests for the numpy image-preprocessing ops (M2/M12/M15/M17) and
the BlobAnalyzer ROI/alignment flags."""

import numpy as np
import pytest

from wine_label_ocr_ray.functions import enhance as E
from wine_label_ocr_ray.state.engines import BlobAnalyzer


def _label_image():
    """Dark background with a bright centered 'label' block containing
    texture."""
    rng = np.random.RandomState(3)
    img = (rng.rand(80, 120) * 20).astype(np.uint8)
    img[20:60, 30:90] = 160
    img[25:55:4, 35:85] = 240  # texture lines -> variance
    return img


def test_edge_map_marks_boundaries():
    img = _label_image()
    edges = E.edge_map(img)
    assert edges.dtype == np.uint8
    assert edges[20, 60] == 255 or edges[19, 60] == 255  # top border
    assert edges[40, 60] in (0, 255)
    assert edges[:10, :10].sum() == 0  # flat background


def test_clahe_stretches_contrast():
    img = np.full((64, 64), 100, dtype=np.uint8)
    img[::2, ::2] = 110
    out = E.clahe(img)
    assert out.shape == img.shape
    # clip-limited equalization widens the 10-level band somewhat
    assert int(out.max()) - int(out.min()) > 10
    # unlimited clip -> full equalization stretch
    wide = E.clahe(img, clip_limit=1000.0)
    assert wide.max() > 200


def test_unsharp_and_adaptive_threshold():
    img = _label_image()
    sharp = E.unsharp(img)
    assert sharp.shape == img.shape and sharp.dtype == np.uint8
    binar = E.adaptive_threshold(sharp)
    assert set(np.unique(binar)) <= {0, 255}


def test_enhance_for_ocr_upscales_small():
    img = _label_image()  # max dim 120 < 250 -> 2x upscale
    sharp, binar = E.enhance_for_ocr(img)
    assert sharp.shape == (160, 240)
    assert binar.shape == (160, 240)


def test_rotate_nearest_identity_and_90():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert (E.rotate_nearest(img, 0) == img).all()
    r90 = E.rotate_nearest(img, 90)
    assert r90.shape == img.shape
    # rotating back recovers most pixels (nearest-neighbor loss at edges)
    back = E.rotate_nearest(r90, -90)
    agree = (back == img).mean()
    assert agree > 0.8


def test_find_label_roi_centers_on_label():
    img = _label_image()
    x1, y1, x2, y2 = E.find_label_roi(img)
    # the detected ROI must overlap the label block substantially
    ix1, iy1, ix2, iy2 = max(x1, 30), max(y1, 20), min(x2, 90), min(y2, 60)
    inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
    assert inter / ((90 - 30) * (60 - 20)) > 0.5


def test_find_label_roi_fallback_margin_box():
    flat = np.full((50, 100), 7, dtype=np.uint8)
    assert E.find_label_roi(flat) == (10, 5, 90, 45)


def test_find_label_roi_downscales_large_frames():
    """hybrid.py:106-109/144-146: inputs with max side > 800 px are
    scored at scale 800/max(H,W) and the winning box rescaled back.
    A 1200x1000 frame with a centered textured label must return a box
    in ORIGINAL coordinates overlapping the label; the flat fallback
    must rescale to the original 10% margin box (within truncation)."""
    rng = np.random.default_rng(7)
    img = np.full((1000, 1200), 230, dtype=np.uint8)
    img[300:700, 360:840] = rng.integers(
        0, 255, (400, 480), dtype=np.uint8)   # textured label block
    x1, y1, x2, y2 = E.find_label_roi(img)
    assert 0 <= x1 < x2 <= 1200 and 0 <= y1 < y2 <= 1000
    ix1, iy1 = max(x1, 360), max(y1, 300)
    ix2, iy2 = min(x2, 840), min(y2, 700)
    inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
    assert inter / (480 * 400) > 0.5
    # flat large frame -> margin fallback, rescaled to original coords
    flat = np.full((1000, 1200), 7, dtype=np.uint8)
    fx1, fy1, fx2, fy2 = E.find_label_roi(flat)
    assert abs(fx1 - 120) <= 3 and abs(fy1 - 100) <= 3
    assert abs(fx2 - 1080) <= 3 and abs(fy2 - 900) <= 3


def test_align_vertically_straightens():
    base = np.zeros((60, 60), dtype=np.uint8)
    base[:, 28:32] = 255  # vertical bar: already aligned
    tilted = E.rotate_nearest(base, 20)
    aligned, angle = E.align_vertically(tilted)
    assert abs(abs(angle) - 20) <= 3  # recovered the tilt (sign per sweep)


def test_blob_analyzer_flags():
    img = _label_image()
    base = BlobAnalyzer(30.0).analyze(img)
    cropped = BlobAnalyzer(30.0, crop_label=True).analyze(img)
    assert base["roi_shape"] == [80, 120]
    assert cropped["roi_shape"] != [80, 120]  # ROI crop applied
    aligned = BlobAnalyzer(30.0, skip_alignment=False).analyze(img)
    assert set(aligned.keys()) == set(base.keys())  # schema fixed


def test_bilateral_preserves_edges_smooths_noise():
    """M2's real bilateral (cv2 d=7, sigma 50/50): flat-region noise
    shrinks while a hard step edge stays essentially unsmeared."""
    rng = np.random.RandomState(7)
    img = np.full((40, 60), 60.0)
    img[:, 30:] = 200.0
    noisy = np.clip(img + rng.randn(40, 60) * 8, 0, 255).astype(np.uint8)
    out = E.bilateral_filter(noisy, 7, 50.0, 50.0)
    assert out.shape == noisy.shape and out.dtype == np.uint8
    # noise reduction in the flat left region
    assert out[:, :25].std() < noisy[:, :25].std() * 0.6
    # edge contrast preserved (gaussian of same support would blur it)
    mid = np.abs(out[:, 31].astype(int) - out[:, 28].astype(int)).mean()
    assert mid > 100
    g = E.gaussian_blur(noisy, 2.0)
    gmid = np.abs(g[:, 31] - g[:, 28]).mean()
    assert mid > gmid


def test_canny_hysteresis_and_nms():
    """M12's real Canny: strong step survives as a thin line, flat
    background is empty, and an isolated weak edge (between lo and hi,
    not connected to any strong pixel) is suppressed by hysteresis."""
    img = np.zeros((50, 80), dtype=np.uint8)
    img[:, 40:] = 200                 # strong vertical step (mag ~800)
    img[10, 5:15] = 20                # faint isolated line (mag < 150)
    edges = E.canny(img, 50.0, 150.0)
    assert set(np.unique(edges)) <= {0, 255}
    col = edges[25, 35:45]
    assert col.any()                  # the step is found
    # NMS thins: at most 2 marked columns across the step
    assert (edges[25] > 0).sum() <= 2
    assert edges[10, 5:15].sum() == 0  # weak + unconnected -> dropped
    assert edges[:8, :30].sum() == 0   # flat background clean
    # a weak segment CONNECTED to a strong edge survives
    img2 = np.zeros((50, 80), dtype=np.uint8)
    img2[:25, 40:] = 200              # strong step, upper half
    img2[25:, 40:] = 35               # weak step, lower half (mag ~140)
    edges2 = E.canny(img2, 50.0, 150.0)
    assert (edges2[35:45, 39:42] > 0).any()


def test_canny_thins_diagonal_edges():
    """Regression for the NMS sector 1/3 neighbor mix-up: with gy
    positive downward, a 45-degree gradient lies along the main (NW/SE)
    diagonal, so NMS must compare those neighbors — otherwise it
    suppresses along the edge instead of across it and a diagonal step
    edge stays ~2px thick. A 60px diagonal step should thin to roughly
    one pixel per row (cv2.Canny keeps ~119 pixels here, not ~232)."""
    n = 60
    img = np.zeros((n, n), dtype=np.uint8)
    for i in range(n):
        img[i, :i + 1] = 200
    edges = E.canny(img, 50.0, 150.0)
    total = int((edges > 0).sum())
    assert 0 < total <= int(2.3 * n)      # ~1px/row (+ edge effects)
    # every interior row of the diagonal is thinned to <= 2 pixels
    interior = (edges[5:n - 5] > 0).sum(axis=1)
    assert interior.max() <= 2
    # and the mirrored diagonal (135 degrees) thins too
    img2 = img[:, ::-1].copy()
    edges2 = E.canny(img2, 50.0, 150.0)
    interior2 = (edges2[5:n - 5] > 0).sum(axis=1)
    assert interior2.max() <= 2


def test_turntable_preprocess_binarizes_with_close():
    """M24 (Char_Count_TurnTable.py:62-70): CLAHE -> adaptive
    threshold(35, 15) -> 2x2 close; output is 0/255 and single-pixel
    holes inside text strokes are closed."""
    img = _label_image()
    out = E.turntable_preprocess(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert set(np.unique(out)) <= {0, 255}
    # differs from the M2 binarization (different block/C + close)
    _, m2_bin = E.enhance_for_ocr(img)
    assert m2_bin.shape != out.shape or (m2_bin != out).any()
    # closing removes isolated one-pixel holes: construct directly
    m = np.ones((20, 20), dtype=np.uint8) * 255
    m[10, 10] = 0
    from wine_label_ocr_ray.functions.imaging import (KERNEL_2X2,
                                                      binary_close)
    closed = binary_close(m > 0, KERNEL_2X2)
    assert closed[10, 10]


def test_clahe_hand_computed_single_tile():
    """VERDICT r4 item 7: pin the cv2 CLAHE algorithm on a hand-traced
    single-tile case. img 2x2 [[0,0],[255,255]], tiles=(1,1), default
    clip 2.0: area=4, clip=max(int(2*4/256),1)=1; hist{0:2,255:2} clips
    to 1 each, clipped=2, batch=2//256=0, residual=2, step=128 -> bins
    0 and 128 get +1. cdf(0)=2, cdf(255)=4; lut=round(cdf*255/4):
    lut[0]=round(127.5)=128 (half-even), lut[255]=255. One tile ->
    interpolation degenerates to the plain LUT."""
    img = np.array([[0, 0], [255, 255]], dtype=np.uint8)
    out = E.clahe(img, clip_limit=2.0, tiles=(1, 1))
    assert out.tolist() == [[128, 128], [255, 255]]


def test_clahe_tile_interpolation_no_seams():
    """Two vertical tiles with different LUTs: output varies SMOOTHLY
    across the tile boundary (bilinear LUT interpolation), instead of
    the per-tile-equalization hard seam."""
    img = np.zeros((8, 16), dtype=np.uint8)
    img[:, :8] = 50   # left tile uniform 50
    img[:, 8:] = 200  # right tile uniform 200
    out = E.clahe(img, clip_limit=1000.0, tiles=(1, 2))
    # each ROW is identical; across columns the value ramps between
    # the two tile LUT responses rather than stepping once at x=8
    row = out[0].astype(int)
    assert (out == row[None, :]).all()
    steps = np.abs(np.diff(row))
    assert steps.max() < 160  # a hard seam would jump ~255 at x=8
    # edge-clamped: outermost quarter-tiles are pure single-tile LUT
    assert row[0] == row[1] == row[2] == row[3]


def test_clahe_reflect101_padding_indices():
    from wine_label_ocr_ray.functions.enhance import _reflect101_indices
    assert _reflect101_indices(4, 6).tolist() == [0, 1, 2, 3, 2, 1]
    assert _reflect101_indices(1, 3).tolist() == [0, 0, 0]
    assert _reflect101_indices(3, 8).tolist() == [0, 1, 2, 1, 0, 1, 2, 1]


def test_clahe_nondivisible_shape_runs_and_matches_divisible_core():
    """A 10x13 image with 8x8 tiles pads reflect-101 to 16x16 for the
    histograms but writes only the 10x13 output."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(10, 13), dtype=np.uint8)
    out = E.clahe(img)
    assert out.shape == img.shape and out.dtype == np.uint8
