"""Video detection path: synthetic mp4 in -> annotated mp4 out."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_detect_video_round_trip(tmp_path, rng):
    from yoloret_tpu.infer import Predictor

    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
    for i in range(6):
        f = np.full((120, 160, 3), 40, np.uint8)
        f[30:70, 20 + 8 * i : 60 + 8 * i] = (0, 0, 255)
        w.write(f)
    w.release()

    anchors = np.array(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
         [116, 90], [156, 198], [373, 326]], np.float32,
    )
    p = Predictor(
        class_names=["a"], anchors=anchors, input_hw=(64, 64),
        score_threshold=0.2, bf16=False,
    )
    out = str(tmp_path / "out.mp4")
    n = p.detect_video(src, output=out, max_frames=6)
    assert n == 6
    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (120, 160, 3)


def test_detect_video_tracker_interleave(tmp_path, rng):
    """track_interval=3 over 6 frames: the detector runs only on frames
    0 and 3; frames 1/2/4/5 are carried by OpenCV trackers (reference
    yolo.py:470-520 interleave, CSRT->MIL fallback on this cv2 build)."""
    from yoloret_tpu.infer import Predictor

    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
    for i in range(6):
        f = np.full((120, 160, 3), 40, np.uint8)
        f[30:70, 20 + 8 * i : 60 + 8 * i] = (0, 0, 255)
        w.write(f)
    w.release()

    anchors = np.array(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
         [116, 90], [156, 198], [373, 326]], np.float32,
    )
    p = Predictor(
        class_names=["a"], anchors=anchors, input_hw=(64, 64),
        score_threshold=0.2, bf16=False,
    )
    calls = []
    inner = p.detect_arrays
    p.detect_arrays = lambda imgs: (calls.append(len(imgs)), inner(imgs))[1]
    out = str(tmp_path / "out.mp4")
    n = p.detect_video(src, output=out, max_frames=6, track_interval=3,
                       max_tracks=3)
    assert n == 6
    assert len(calls) == 2  # frames 0 and 3 only
    cap = cv2.VideoCapture(out)
    frames = 0
    while cap.read()[0]:
        frames += 1
    cap.release()
    assert frames == 6


def test_detect_video_bad_source():
    from yoloret_tpu.infer import Predictor

    anchors = np.zeros((9, 2), np.float32) + 10
    p = Predictor(class_names=["a"], anchors=anchors, input_hw=(64, 64), bf16=False)
    with pytest.raises(IOError):
        p.detect_video("/nonexistent/file.mp4")
