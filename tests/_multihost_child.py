"""Child process for the 2-process jax.distributed (DCN-path) test.

Run as: python tests/_multihost_child.py <process_id> <num_processes> <port>

Each process hosts 2 virtual CPU devices (XLA_FLAGS set by the parent),
initializes jax.distributed against a local coordinator — the same call
the trainer's ``--multihost`` switch makes (train/trainer.py; reference
TPUStrategy path code/train.py:48-53) — builds the GLOBAL (data, model)
mesh, and takes one real train_step with the batch sharded across all
processes. Prints MULTIHOST_OK with the loss on success.
"""

import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    import optax
    from functools import partial

    from yoloret_tpu.nn import build_detector
    from yoloret_tpu.ops import assign_targets_batch, true_corner_boxes
    from yoloret_tpu.parallel import batch_sharding, make_mesh, replicate
    from yoloret_tpu.train import StepConfig, TrainState, train_step

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == n_local * nproc, (n_global, n_local)
    mesh = make_mesh()  # global mesh spanning both processes
    data_shard, repl = batch_sharding(mesh), replicate(mesh)

    anchors = np.asarray(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
         [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)
    size, nc = 64, 3
    model = build_detector("yolo_fastest", num_classes=nc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32), False
    )
    tx = optax.adam(1e-3, eps=1e-8)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    # Replicated state: every process owns identical full copies.
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x))
        if hasattr(x, "shape") else x,
        state,
    )

    # Global batch: one image per global device; this process materializes
    # only its local shard (the multi-host input contract).
    rng = np.random.RandomState(0)
    boxes = np.zeros((n_global, 20, 5), np.float32)
    boxes[:, 0, :4] = [8, 8, 40, 40]
    y0, y1, y2 = assign_targets_batch(
        jnp.asarray(boxes), (size, size), jnp.asarray(anchors), nc
    )
    gt, valid = true_corner_boxes(jnp.asarray(boxes), (size, size))
    host_batch = {
        "images": rng.rand(n_global, size, size, 3).astype(np.float32),
        "y_true_0": np.asarray(y0), "y_true_1": np.asarray(y1),
        "y_true_2": np.asarray(y2),
        "gt_boxes": np.asarray(gt), "gt_valid": np.asarray(valid),
    }
    lo = pid * n_local
    batch = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            data_shard, x[lo : lo + n_local]
        ),
        host_batch,
    )

    cfg = StepConfig(anchors=tuple(map(tuple, anchors.tolist())))
    step = jax.jit(
        partial(train_step, cfg=cfg),
        in_shardings=(repl, data_shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics)
    # Loss is replicated — addressable from every process.
    loss = float(jax.device_get(metrics["loss"].addressable_data(0)))
    assert np.isfinite(loss), loss
    assert int(new_state.step.addressable_data(0)) == 1
    print(f"MULTIHOST_OK pid={pid} loss={loss:.4f}", flush=True)

    if len(sys.argv) > 4:
        _data_phase(pid, nproc, mesh, data_shard, repl, anchors, sys.argv[4])


def _data_phase(pid, nproc, mesh, data_shard, repl, anchors, ann):
    """Per-host input sharding: a REAL Dataset stream where this process
    decodes only its row slice, assembled into one global sharded batch
    (data/pipeline.py process_index/process_count +
    parallel/prefetch.py local_data)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from functools import partial

    from yoloret_tpu.data import Dataset
    from yoloret_tpu.nn import build_detector
    from yoloret_tpu.parallel import device_prefetch
    from yoloret_tpu.train import StepConfig, TrainState, train_step

    n_global = len(jax.devices())
    size, nc = 64, 3
    ds = Dataset(
        ann, batch_size=n_global, anchors=anchors, num_classes=nc,
        input_hw=(size, size), seed=11, num_workers=1,
        process_index=pid, process_count=nproc,
    )
    loaded = []
    orig_load = ds._load_sample

    def spy(idx, jq, aa=None):
        loaded.append(int(idx))
        return orig_load(idx, jq, aa)

    ds._load_sample = spy
    batch = next(device_prefetch(
        ds.build(epochs=1), data_shard, size=1, local_data=True))
    assert batch["images"].shape[0] == n_global  # global batch assembled
    n_local_rows = n_global // nproc
    assert len(loaded) == n_local_rows, loaded  # decoded only our slice

    model = build_detector("yolo_fastest", num_classes=nc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32), False
    )
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"],
        optax.adam(1e-3, eps=1e-8),
    )
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x))
        if hasattr(x, "shape") else x,
        state,
    )
    cfg = StepConfig(anchors=tuple(map(tuple, anchors.tolist())))
    step = jax.jit(
        partial(train_step, cfg=cfg),
        in_shardings=(repl, data_shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics["loss"].addressable_data(0)))
    assert np.isfinite(loss), loss
    print(
        f"MULTIHOST_DATA_OK pid={pid} loss={loss:.6f} "
        f"loaded={sorted(loaded)}", flush=True,
    )


if __name__ == "__main__":
    main()
