"""Detection-server test: real HTTP round-trip with micro-batching."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    from PIL import Image  # noqa: F401

    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.serve import DetectionServer

    anchors = np.array(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
         [116, 90], [156, 198], [373, 326]], np.float32,
    )
    pred = Predictor(
        class_names=["a", "b"], anchors=anchors,
        input_hw=(64, 64), score_threshold=0.2, bf16=False,
    )
    srv = DetectionServer(pred, host="127.0.0.1", port=0, max_batch=2)
    srv.start(block=False)
    yield f"http://127.0.0.1:{srv.port}"
    srv.stop()


def _jpeg(rng):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((rng.rand(50, 60, 3) * 255).astype(np.uint8)).save(
        buf, format="JPEG"
    )
    return buf.getvalue()


def test_healthz(server):
    r = json.loads(urllib.request.urlopen(server + "/healthz").read())
    assert r["status"] == "ok" and r["classes"] == 2


def test_detect_and_concurrency(server, rng):
    data = _jpeg(rng)
    req = urllib.request.Request(server + "/detect", data=data, method="POST")
    r = json.loads(urllib.request.urlopen(req).read())
    assert "detections" in r and "latency_ms" in r
    for d in r["detections"][:3]:
        assert set(d) == {"box", "score", "class_id", "class_name"}

    results = []

    def hit():
        rq = urllib.request.Request(server + "/detect", data=data, method="POST")
        results.append(json.loads(urllib.request.urlopen(rq).read()))

    ts = [threading.Thread(target=hit) for _ in range(5)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(results) == 5 and all("detections" in r for r in results)


def test_bad_image_400(server):
    req = urllib.request.Request(server + "/detect", data=b"junk", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/nowhere")
    assert e.value.code == 404
