"""Driver-interface tests for __graft_entry__.py.

The driver imports the module and calls ``dryrun_multichip(n)`` directly —
possibly in a process already initialized on a single (tunneled TPU) device.
Round 1 failed exactly there (MULTICHIP_r01.json ok=false): the function
asserted on device count instead of bootstrapping a virtual CPU mesh. These
tests pin the bootstrap contract without paying for a full child run.
"""

import os
import sys

import pytest


def _load_entry():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.pop(0)
    return g


def test_bootstrap_env_forces_virtual_cpu_mesh(monkeypatch):
    g = _load_entry()
    captured = {}

    class FakeProc:
        returncode = 0

    def fake_run(cmd, env=None, cwd=None):
        captured["cmd"] = cmd
        captured["env"] = env
        captured["cwd"] = cwd
        return FakeProc()

    monkeypatch.setattr("subprocess.run", fake_run)
    monkeypatch.delenv("_YOLORET_DRYRUN_CHILD", raising=False)
    # Simulate the driver's env: axon plugin armed, stale device-count flag.
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_foo=1 --xla_force_host_platform_device_count=2"
    )

    g._bootstrap_virtual_mesh(8)

    env = captured["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["PALLAS_AXON_POOL_IPS"] == ""  # falsy -> plugin not registered
    assert env["_YOLORET_DRYRUN_CHILD"] == "1"
    flags = env["XLA_FLAGS"].split()
    assert "--xla_force_host_platform_device_count=8" in flags
    assert "--xla_force_host_platform_device_count=2" not in flags
    assert "--xla_foo=1" in flags  # unrelated flags preserved
    assert captured["cmd"][0] == sys.executable
    assert "dryrun_multichip(8)" in captured["cmd"][2]
    assert os.path.isfile(os.path.join(captured["cwd"], "__graft_entry__.py"))


def test_bootstrap_refuses_recursion(monkeypatch):
    g = _load_entry()
    monkeypatch.setenv("_YOLORET_DRYRUN_CHILD", "1")
    with pytest.raises(RuntimeError, match="bootstrap failed"):
        g._bootstrap_virtual_mesh(8)


def test_bootstrap_raises_on_child_failure(monkeypatch):
    g = _load_entry()

    class FakeProc:
        returncode = 3

    monkeypatch.setattr("subprocess.run", lambda *a, **k: FakeProc())
    monkeypatch.delenv("_YOLORET_DRYRUN_CHILD", raising=False)
    with pytest.raises(RuntimeError, match="rc=3"):
        g._bootstrap_virtual_mesh(8)


def test_dryrun_runs_inline_when_devices_suffice():
    # The test env IS an 8-device virtual CPU mesh (conftest), so the
    # driver-identical call must take the inline path, not a subprocess.
    import jax

    assert len(jax.devices()) >= 8
    g = _load_entry()
    g.dryrun_multichip(2)  # tiny mesh keeps this fast; exercises impl inline
