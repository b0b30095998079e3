"""Accuracy-regression gate (opt-in: ``pytest -m slow``).

Pins the end-to-end training + eval recipe to a measured mAP band on the
crowded 4-class synthetic (fixed seed, fixed epochs), so perf work on
the model/postprocess/data paths cannot silently trade accuracy — the
reference's only QA was eyeballing ``--mode=MAP`` (yolo.py:397-405).

The recipe runs IN A SUBPROCESS with a pinned single-CPU-device
environment, NOT in the test process: the suite's
``--xla_force_host_platform_device_count=8`` flag changes XLA CPU
reduction tiling, which perturbs the train-step numerics by ~6e-4 at
epoch 0 and — through 60 epochs of partial convergence — chaotically
moves the final mAP (0.3138 one-device vs 0.1445 eight-device, measured
round 3 on the SAME tree and bitwise-identical input batches). The host
data pipeline is deterministic under both topologies
(tests/test_pipeline_determinism.py); only the device topology had to
be pinned to make the run reproducible. See
yoloret_tpu/tools/accuracy_gate.py for the measurement details.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_crowded_synthetic_map_band(tmp_path):
    env = dict(os.environ)
    # Pin the numerics: no axon plugin, single XLA CPU device (the
    # calibration topology). Everything else inherits.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-m", "yoloret_tpu.tools.accuracy_gate",
         "--workdir", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=5400,
    )
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-4000:])
    assert proc.returncode == 0, "gate subprocess failed"
    lines = [l for l in proc.stdout.splitlines() if l.startswith("GATE_RESULT ")]
    assert lines, "gate subprocess printed no GATE_RESULT line"
    result = json.loads(lines[-1][len("GATE_RESULT "):])
    mAP = result["mAP"]
    print(f"crowded-synthetic mAP @{result['epochs']} epochs: {mAP:.4f} "
          f"(per-class {result['aps']})")
    # Band calibrated in round 3: this exact recipe (seed 0, 60 epochs,
    # mild augment) measured mAP 0.3138 on one CPU device — partial
    # convergence BY DESIGN (a fully-overfit model is insensitive to
    # pipeline regressions). With the topology pinned the run is
    # bitwise reproducible, so the generous +/- band only absorbs
    # jax/XLA version drift. Below the floor = a silent accuracy
    # regression; above the ceiling = the recipe changed (recalibrate,
    # don't widen).
    assert 0.22 <= mAP <= 0.45, f"mAP {mAP:.4f} left the calibrated band"
    assert all(np.isfinite(list(result["aps"].values())))
