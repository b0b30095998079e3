"""Cross-topology checkpoint restore: save under one device mesh,
restore under another. This is the operational path when a run moves
onto (or off) a pod slice — the reference's whole recovery story is
restart-from-checkpoint (reference: code/train.py:44-46), but it never
faced a topology change; ours must survive one.

Two layers:
  * checkpoint layer — values restored under a different mesh are
    BITWISE the saved values, with the target topology's sharding;
  * trainer e2e — a run preempted under mesh=1 resumes and completes
    under mesh=8 (and the reverse), continuing from the checkpoint
    epoch rather than replaying.
"""

import json
import os

import numpy as np
import pytest

from yoloret_tpu.configs import RunConfig

from test_trainer_e2e import tiny_voc  # noqa: F401  (fixture)


def _devices(n):
    import jax

    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")
    return jax.devices()[:n]


def _replicated_put(tree, n):
    import jax

    from yoloret_tpu.parallel import make_mesh, replicate

    repl = replicate(make_mesh(_devices(n)))
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree), repl


def test_checkpoint_cross_topology_values(tmp_path):
    """save under mesh=1 -> restore under mesh=8 (and 8 -> 1): leaves
    are bitwise-equal and land on the TARGET topology's sharding."""
    import jax

    from yoloret_tpu.utils.checkpoint import load_params, save_params

    rng = np.random.RandomState(0)
    host = {
        "params": {"w": rng.randn(16, 24).astype(np.float32),
                   "b": rng.randn(24).astype(np.float32)},
        "step": np.int32(7),
    }
    for n_save, n_restore in ((1, 8), (8, 1)):
        src, _ = _replicated_put(host, n_save)
        path = str(tmp_path / f"ckpt_{n_save}to{n_restore}")
        save_params(path, src)

        like, repl = _replicated_put(
            jax.tree.map(np.zeros_like, host), n_restore)
        out = load_params(path, like=like)
        for k in ("w", "b"):
            np.testing.assert_array_equal(
                np.asarray(out["params"][k]), host["params"][k])
            assert out["params"][k].sharding.is_equivalent_to(
                repl, out["params"][k].ndim)
        assert int(out["step"]) == 7


def _mkcfg(tiny_voc, log_dir, mesh, batch):  # noqa: F811
    return RunConfig(
        backbone="yolo_fastest",
        input_size=(64, 64),
        train_dataset=tiny_voc["ann"],
        val_dataset=tiny_voc["ann"],
        classes_path=tiny_voc["classes"],
        anchors_path=tiny_voc["anchors"],
        batch_size=batch,  # global batch = batch * mesh = 8 either way
        epochs=(4, 4),
        learning_rate=(1e-3, 1e-4),
        freeze=True,
        bf16=False,
        mesh_data=mesh,
        checkpoint_every=2,
        log_dir=log_dir,
        seed=0,
    )


@pytest.mark.parametrize("from_mesh,to_mesh", [(1, 8), (8, 1)])
def test_cross_topology_resume(tiny_voc, tmp_path, monkeypatch,  # noqa: F811
                               from_mesh, to_mesh):
    """Preempt under one topology right after the epoch-1 checkpoint,
    resume under the other: the resumed run restores the optimizer/EMA/
    step state into the new mesh's shardings, continues at epoch 2 (no
    replay), and finishes all 4 epochs with finite losses."""
    _devices(max(from_mesh, to_mesh))
    from yoloret_tpu.train.trainer import train
    from yoloret_tpu.utils.checkpoint import CheckpointManager

    log_dir = os.path.join(str(tmp_path), f"x{from_mesh}to{to_mesh}")
    cfg = _mkcfg(tiny_voc, log_dir, from_mesh, 8 // from_mesh)

    orig = CheckpointManager.maybe_save

    def preempt(self, epoch, tree, val_loss):
        saved = orig(self, epoch, tree, val_loss)
        if saved and epoch == 1:
            self._mngr.wait_until_finished()
            raise KeyboardInterrupt("simulated preemption")
        return saved

    monkeypatch.setattr(CheckpointManager, "maybe_save", preempt)
    with pytest.raises(KeyboardInterrupt):
        train(cfg)
    monkeypatch.undo()

    out = train(
        cfg.replace(resume=True, mesh_data=to_mesh, batch_size=8 // to_mesh))
    assert os.path.isdir(out)

    path = os.path.join(log_dir, "yolo_fastest_stage1", "metrics.jsonl")
    trace = {m["epoch"]: m for m in map(json.loads, open(path)) if "loss" in m}
    # epochs 0-1 from the preempted run, 2-3 appended by the resumed one
    assert sorted(trace) == [0, 1, 2, 3]
    assert all(np.isfinite(trace[e]["loss"]) for e in trace)
