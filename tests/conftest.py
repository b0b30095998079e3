"""Test config: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the remote-TPU (axon) PJRT plugin at
interpreter startup whenever PALLAS_AXON_POOL_IPS is set, overriding
JAX_PLATFORMS — which would serialize every test through one tunneled chip.
That happens before conftest runs, so the only clean fix is to re-exec the
test process once with the hook disabled and CPU forced. Multi-device (DP)
tests then run on 8 simulated host devices per the build brief; the real TPU
is exercised only by bench.py / the driver.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # falsy -> sitecustomize skips register()
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
