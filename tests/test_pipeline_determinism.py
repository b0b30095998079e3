"""Pipeline determinism and zoom-ensemble Predictor coverage."""

import numpy as np
import pytest

from yoloret_tpu.data import Dataset

ANCHORS = np.array(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
     [116, 90], [156, 198], [373, 326]], np.float32,
)


@pytest.fixture
def tiny(tmp_path, rng):
    from PIL import Image

    lines = []
    for i in range(4):
        arr = (rng.rand(70, 90, 3) * 255).astype(np.uint8)
        p = tmp_path / f"i{i}.jpg"
        Image.fromarray(arr).save(p)
        lines.append(f"{p} 8,8,40,40,{i % 2}")
    ann = tmp_path / "t_4.txt"
    ann.write_text("\n".join(lines) + "\n")
    return str(ann)


def test_train_pipeline_deterministic_given_seed(tiny):
    def first_batch(seed):
        ds = Dataset(
            tiny, batch_size=2, anchors=ANCHORS, num_classes=2,
            input_hw=(64, 64), seed=seed, num_workers=2,
            jpeg_quality=None,  # jpeg-quality aug draws from a shared host rng
        )
        return next(ds.build(epochs=1))

    a = first_batch(7)
    b = first_batch(7)
    np.testing.assert_array_equal(np.asarray(a["images"]), np.asarray(b["images"]))
    np.testing.assert_array_equal(np.asarray(a["y_true_0"]), np.asarray(b["y_true_0"]))
    c = first_batch(8)
    assert not np.array_equal(np.asarray(a["images"]), np.asarray(c["images"]))


def test_pipeline_identical_across_device_topologies(tiny):
    """The finalized batch stream is bitwise identical on 1 vs 8 virtual
    CPU devices. The TRAIN STEP is NOT (XLA-CPU reduction tiling differs
    ~6e-4 at epoch 0 — the round-3 accuracy-gate incident, see
    tools/accuracy_gate.py), which is exactly why the pipeline guarantee
    matters: it pins stream bugs apart from numeric-topology drift."""
    import subprocess
    import sys
    import os

    script = (
        "import hashlib, numpy as np\n"
        "from yoloret_tpu.data import Dataset\n"
        "anchors = np.array([[10,13],[16,30],[33,23],[30,61],[62,45],"
        "[59,119],[116,90],[156,198],[373,326]], np.float32)\n"
        f"ds = Dataset({tiny!r}, batch_size=2, anchors=anchors,"
        " num_classes=2, input_hw=(64, 64), seed=3, num_workers=2)\n"
        "h = hashlib.md5()\n"
        "for i, b in enumerate(ds.build(epochs=1)):\n"
        "    for k in sorted(b):\n"
        "        h.update(np.asarray(b[k]).tobytes())\n"
        "print('HASH', h.hexdigest())\n"
    )

    def run(xla_flags):
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = xla_flags
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, timeout=600)
        assert out.returncode == 0, out.stderr[-2000:]
        return [l for l in out.stdout.splitlines() if l.startswith("HASH")]

    one = run("")
    eight = run("--xla_force_host_platform_device_count=8")
    assert one and one == eight


def test_predictor_zoom_ensemble_runs(rng):
    from yoloret_tpu.infer import Predictor

    p = Predictor(
        class_names=["a"], anchors=ANCHORS, input_hw=(128, 128),
        score_threshold=0.2, bf16=False, zoom_ensemble=True, zoom_hw=(64, 64),
    )
    img = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
    dets = p.detect_arrays([img])[0]
    assert isinstance(dets, list)
    for d in dets[:3]:
        x1, y1, x2, y2 = d.box
        assert 0 <= x1 <= 140 and 0 <= y2 <= 100
