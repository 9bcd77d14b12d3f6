"""The turntable guidance state machine (W1, W4-W8) re-expressed as a
deterministic batch replay over an ordered per-stream frame sequence.

The reference runs this interactively per camera frame
(``Char_Count_TurnTable.py:141-359``): OCR-throttle (W1), EMA (W2),
peak tracker with bump threshold (W4), the
``SCAN_CLOCKWISE -> POST_PEAK_SEEK -> lock`` phase machine (W5),
unlock hysteresis with margin + dwell (W6), presence/absence debounce
for session start/end (W7), and the session lifecycle with
capture-once-per-lock (W8). The reference's W3 sliding window feeds
only its HUD "range" readout — no transition reads it — so it is NOT
replayed here; the standalone ``events_sliding`` query covers W3. Every transition depends only on
``(ts, present, count)`` — wall-clock enters solely through the
frame timestamps — so the whole loop replays exactly over a recorded
stream. The batch analog of the SPACE-key arm is "always armed":
a session starts on the first present frame (the reference's
"immediate" start path at ``:219-220``).

Constants default to the reference's values (``:20-46``). Each is a
parameter because the reference tuned them for a ~4 fps camera; batch
callers replaying slower event streams scale the three time-valued
knobs (ocr_interval, unlock dwell) by their cadence while
keeping the count-valued thresholds untouched.

State is strictly sequential WITHIN a stream (lock/unlock feeds back
into later transitions), so the Ray form is parallelism ACROSS
streams — ``groupby(stream).map_groups(replay)`` — not vectorization
within one; per-stream cost is O(frames).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

# Reference constants (Char_Count_TurnTable.py:20-46)
OCR_INTERVAL = 0.25      # W1: seconds between OCR samples
ALPHA = 0.25             # W2: EMA factor
PEAK_BUMP_MIN = 1.0      # W4: raise peak only if exceeded by this
DROP_TO_START = 5.0      # W5: drop below peak -> POST_PEAK_SEEK
MATCH_BAND = 0.0         # W5: accept [peak - band, peak] as centered
UNLOCK_MARGIN = 3.0      # W6: drift below band by this to arm unlock
UNLOCK_DWELL = 0.6       # W6: seconds below before actually unlocking
PRESENT_THRES = 5        # W7 (reserved by the reference; start is
                         #     immediate-on-present at :219-220)
ABSENT_THRESH = 8        # W7: consecutive absent frames -> end session


def replay_guidance(ts: np.ndarray, present: np.ndarray,
                    count: np.ndarray, *,
                    ocr_interval: float = OCR_INTERVAL,
                    alpha: float = ALPHA,
                    peak_bump_min: float = PEAK_BUMP_MIN,
                    drop_to_start: float = DROP_TO_START,
                    match_band: float = MATCH_BAND,
                    unlock_margin: float = UNLOCK_MARGIN,
                    unlock_dwell: float = UNLOCK_DWELL,
                    absent_thresh: int = ABSENT_THRESH) -> List[Dict]:
    """Replay one stream's frames (ts seconds ascending) through the
    full W1+W4-W8 machine; returns one summary dict per session:
    session_id, start/end ts, frame + OCR-sample counts, final peak,
    lock stats, unlock count, and whether the center capture fired.

    Mirrors ``Char_Count_TurnTable.py`` main-loop order exactly:
    presence counters -> immediate start -> absent auto-end ->
    throttled OCR -> EMA -> peak bump -> phase/lock ->
    capture-once -> unlock hysteresis."""
    out: List[Dict] = []
    in_session = False
    session_id = 1
    present_run = absent_run = 0
    # per-session guidance state
    phase = "SCAN_CLOCKWISE"
    peak = None
    lock = False
    unlock_timer = None
    captured = False
    smoothed = None
    last_ocr = -np.inf
    sess: Dict = {}

    def start_session(now: float) -> None:
        nonlocal in_session, phase, peak, lock, unlock_timer, captured
        nonlocal smoothed, present_run, absent_run, sess
        in_session = True
        phase = "SCAN_CLOCKWISE"
        peak = None
        lock = False
        unlock_timer = None
        captured = False
        smoothed = None
        present_run = absent_run = 0
        sess = {"session_id": session_id, "start_ts": now, "end_ts": now,
                "n_frames": 0, "n_ocr": 0, "first_lock_ts": None,
                "n_locks": 0, "n_unlocks": 0, "n_captures": 0}

    def end_session() -> None:
        nonlocal in_session, session_id, present_run, absent_run
        sess["peak_count"] = None if peak is None else float(peak)
        sess["locked"] = bool(lock)
        sess["captured"] = bool(captured)
        out.append(dict(sess))
        in_session = False
        session_id += 1
        present_run = absent_run = 0

    for i in range(len(ts)):
        now = float(ts[i])
        has_bottle = bool(present[i])
        if has_bottle:
            present_run += 1
            absent_run = 0
        else:
            present_run = 0
            absent_run += 1
        if not in_session and has_bottle:
            start_session(now)        # "immediate" start (:219-220)
        if in_session and absent_run >= absent_thresh:
            end_session()
        if not in_session:
            continue
        sess["n_frames"] += 1
        sess["end_ts"] = now
        if not has_bottle or (now - last_ocr) < ocr_interval:
            continue                  # W1 throttle (+ no-ROI frames)
        last_ocr = now
        sess["n_ocr"] += 1
        cnt = float(count[i])
        smoothed = cnt if smoothed is None else \
            alpha * cnt + (1 - alpha) * smoothed
        if peak is None or smoothed >= peak + peak_bump_min:
            peak = smoothed
        if not lock:
            if phase == "SCAN_CLOCKWISE":
                if smoothed <= peak - drop_to_start:
                    phase = "POST_PEAK_SEEK"
            elif phase == "POST_PEAK_SEEK":
                if smoothed >= max(0.0, peak - match_band):
                    lock = True
                    unlock_timer = None
                    sess["n_locks"] += 1
                    if sess["first_lock_ts"] is None:
                        sess["first_lock_ts"] = now
                    if not captured:
                        captured = True   # capture-once-per-lock (W8)
                        sess["n_captures"] += 1
        else:
            if smoothed < peak - (match_band + unlock_margin):
                if unlock_timer is None:
                    unlock_timer = now
                if now - unlock_timer >= unlock_dwell:
                    lock = False
                    phase = "POST_PEAK_SEEK"
                    unlock_timer = None
                    captured = False
                    sess["n_unlocks"] += 1
            else:
                unlock_timer = None
    if in_session:
        end_session()                 # stream ended mid-session
    return out
