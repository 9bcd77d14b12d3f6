"""W1+W4-W8 turntable guidance state machine: hand-traced transition
tests for the pure replay, plus the Ray query's equivalence to a
direct per-user replay (proving the bucketed groupby preserves
per-stream ordering and state isolation)."""

import numpy as np
import pandas as pd
import pytest

from wine_label_ocr_ray.functions.guidance import replay_guidance

TESTDATA = "/root/testdata/sf0.01"


def _trace(counts, present=None, **kw):
    counts = np.asarray(counts, dtype=np.float64)
    n = len(counts)
    ts = np.arange(n, dtype=np.float64)
    if present is None:
        present = np.ones(n, dtype=bool)
    kw.setdefault("ocr_interval", 1.0)
    kw.setdefault("unlock_dwell", 2.0)
    return replay_guidance(ts, np.asarray(present), counts, **kw)


def test_lock_unlock_capture_cycle():
    """Plateau -> deep drop (POST_PEAK_SEEK) -> rise through peak
    (lock + capture once) -> deep drift past dwell (unlock)."""
    counts = [20.0] * 10 + [0.0] * 8 + [30.0] * 6 + [0.0] * 8 + [0.0] * 8
    present = [True] * 32 + [False] * 8
    (s,) = _trace(counts, present)
    assert s["n_locks"] == 1 and s["first_lock_ts"] == 21.0
    assert s["n_captures"] == 1
    assert s["n_unlocks"] == 1
    assert not s["locked"] and not s["captured"]  # ended unlocked
    assert s["n_ocr"] == 32 and s["n_frames"] == 39
    # peak only ratchets with the +1.0 bump threshold
    assert s["peak_count"] == pytest.approx(25.017, abs=0.01)


def test_no_lock_without_post_peak_drop():
    """Monotone rise never leaves SCAN_CLOCKWISE: no lock."""
    (s,) = _trace(np.linspace(5, 40, 30))
    assert s["n_locks"] == 0 and s["first_lock_ts"] is None
    assert not s["captured"]


def test_relock_captures_again():
    """After an unlock, a second pass through the peak re-locks and
    captures again (captured_center resets on unlock in the
    reference)."""
    cyc = [20.0] * 8 + [0.0] * 8 + [30.0] * 5
    counts = cyc + [0.0] * 8 + [30.0] * 5
    (s,) = _trace(counts)
    assert s["n_locks"] == 2 and s["n_unlocks"] == 1
    assert s["n_captures"] == 2
    assert s["locked"] and s["captured"]


def test_session_debounce_splits_streams():
    """>= 8 consecutive absent frames end the session; the next
    present frame starts a new one immediately."""
    counts = [10.0] * 12 + [0.0] * 9 + [10.0] * 12
    present = [True] * 12 + [False] * 9 + [True] * 12
    out = _trace(counts, present)
    assert [s["session_id"] for s in out] == [1, 2]
    assert out[0]["n_ocr"] == 12
    assert out[1]["start_ts"] == 21.0
    # 7 absent frames do NOT split
    present2 = [True] * 12 + [False] * 7 + [True] * 12
    out2 = _trace(counts[:31], present2)
    assert len(out2) == 1


def test_ocr_throttle_skips_fast_frames():
    """W1: frames closer than ocr_interval are displayed but not
    OCR-sampled."""
    counts = np.full(20, 10.0)
    ts = np.arange(20) * 0.1  # 10x faster than the 1.0s interval
    out = replay_guidance(ts, np.ones(20, bool), counts,
                          ocr_interval=1.0)
    (s,) = out
    assert s["n_frames"] == 20
    assert s["n_ocr"] == 2  # t=0.0 and t=1.0 (then 1.9 < 1.0+1.0)


def test_query_matches_direct_replay(ray_session):
    """The Ray pipeline (bucketed per-user map_groups) must equal a
    driver-side pandas replay of every user stream."""
    from wine_label_ocr_ray.pipelines.queries_rel import (
        _GUIDANCE_TIME_SCALE, events_turntable_guidance)

    got = events_turntable_guidance(TESTDATA)
    assert len(got) > 0
    ev = pd.read_parquet(f"{TESTDATA}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type", "value"])
    rows = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(
            np.int64) / 1e6
        for s in replay_guidance(
                ts, (g["event_type"] != "error").to_numpy(),
                g["value"].to_numpy(),
                ocr_interval=0.25 * _GUIDANCE_TIME_SCALE,
                unlock_dwell=0.6 * _GUIDANCE_TIME_SCALE):
            rows.append({**s, "user_id": int(uid)})
    exp = pd.DataFrame(rows)[got.columns.tolist()] \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # invariants
    assert (got["n_ocr"] <= got["n_frames"]).all()
    assert (got["n_captures"] <= got["n_locks"]).all()
    locked = got[got["first_lock_ts"].notna()]
    assert (locked["first_lock_ts"] >= locked["start_ts"]).all()
    assert (locked["first_lock_ts"] <= locked["end_ts"]).all()
