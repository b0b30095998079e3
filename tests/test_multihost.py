"""2-process jax.distributed smoke test — the trainer's --multihost
(DCN) path (reference TPUStrategy distribution, code/main.py:94,
code/train.py:48-53).

Round-1 gap: ``--multihost`` had zero coverage. Here two OS processes
each host 2 virtual CPU devices, rendezvous through a local
coordinator, build one GLOBAL 4-device (data, model) mesh, and take one
real train_step with the batch sharded across processes (gradient
all-reduce rides the simulated DCN). This is the same
``jax.distributed.initialize`` + ``make_mesh`` + sharded-jit sequence
``train/trainer.py`` runs when ``multihost=True``.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "_multihost_child.py")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])

    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), "2", str(port)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-3000:]
    # both processes computed the SAME replicated loss
    l0 = [l for l in outs[0].splitlines() if "MULTIHOST_OK" in l][0].split("loss=")[1]
    l1 = [l for l in outs[1].splitlines() if "MULTIHOST_OK" in l][0].split("loss=")[1]
    assert l0 == l1, (l0, l1)


def test_two_process_sharded_input_pipeline(tmp_path):
    """Per-host input sharding: each process decodes ONLY its rows of the
    global batch, the assembled global batch trains, and the loss equals
    a single-process run over the same (unsharded) Dataset stream."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        arr = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(p)
        lines.append(f"{p} 10,10,60,50,{i % 3}")
    ann = tmp_path / "train_4.txt"
    ann.write_text("\n".join(lines) + "\n")

    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "_multihost_child.py")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])

    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), "2", str(port), str(ann)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    recs = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if "MULTIHOST_DATA_OK" in l]
        assert line, out[-3000:]
        loss = float(line[0].split("loss=")[1].split()[0])
        loaded = eval(line[0].split("loaded=")[1])
        recs[pid] = (loss, loaded)

    # each host decoded a DISJOINT half; together they covered the batch
    assert len(recs[0][1]) == 2 and len(recs[1][1]) == 2
    assert not set(recs[0][1]) & set(recs[1][1])
    assert recs[0][0] == recs[1][0]  # replicated loss identical

    # single-process oracle: same stream unsharded over a local 4-dev mesh
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from yoloret_tpu.data import Dataset, load_anchors
    from yoloret_tpu.nn import build_detector
    from yoloret_tpu.parallel import batch_sharding, device_prefetch, make_mesh, replicate
    from yoloret_tpu.train import StepConfig, TrainState, train_step

    anchors = np.asarray(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
         [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)
    size, nc = 64, 3
    mesh = make_mesh(devices=jax.devices()[:4], data=4)
    data_shard, repl = batch_sharding(mesh), replicate(mesh)
    ds = Dataset(
        str(ann), batch_size=4, anchors=anchors, num_classes=nc,
        input_hw=(size, size), seed=11, num_workers=1,
    )
    batch = next(device_prefetch(ds.build(epochs=1), data_shard, size=1))
    model = build_detector("yolo_fastest", num_classes=nc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32), False
    )
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"],
        optax.adam(1e-3, eps=1e-8),
    )
    state = jax.tree.map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, state
    )
    cfg = StepConfig(anchors=tuple(map(tuple, anchors.tolist())))
    step = jax.jit(
        partial(train_step, cfg=cfg),
        in_shardings=(repl, data_shard, repl),
        out_shardings=(repl, repl),
    )
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    oracle = float(metrics["loss"])
    np.testing.assert_allclose(recs[0][0], oracle, rtol=2e-5)
