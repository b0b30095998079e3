"""Multi-chip scaling accounting (tools/scaling.py): weak scaling of the
sharded train step + collective-traffic bounds, on the virtual CPU mesh.

Collective bytes / per-device cost are program properties from the SPMD
partitioner, not backend performance — they transfer to real ICI meshes
(SURVEY §2.3: the reference's tf.distribute semantics, never quantified
there)."""

import jax
import numpy as np
import pytest

from yoloret_tpu.tools.scaling import analyze, hlo_collective_bytes

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_hlo_collective_parser():
    text = """
  %all-reduce.1 = f32[1675923]{0} all-reduce(f32[1675923]{0} %x), replica_groups={}
  %ar2 = (f32[48]{0}, f32[96]{0}) all-reduce(%a, %b), to_apply=%sum
  %notcoll = f32[4]{0} add(f32[4]{0} %p, f32[4]{0} %q)
  %ag = bf16[8,16]{1,0} all-gather(bf16[1,16]{1,0} %c), dimensions={0}
"""
    got = hlo_collective_bytes(text)
    assert got["all-reduce"] == 1675923 * 4 + (48 + 96) * 4
    assert got["all-gather"] == 8 * 16 * 2
    assert got["reduce-scatter"] == 0


def test_weak_scaling_and_collective_traffic():
    rows = {n: analyze(n) for n in (1, 2, 8)}

    # Single-device program: no collectives at all.
    assert sum(rows[1]["train_collective_bytes"].values()) == 0
    assert sum(rows[1]["serve_collective_bytes"].values()) == 0

    base_flops = rows[1]["train_flops_per_device"]
    base_bytes = rows[1]["train_bytes_per_device"]
    assert np.isfinite(base_flops) and base_flops > 0
    for n in (2, 8):
        r = rows[n]
        # Weak scaling: with per-device batch fixed, the per-device
        # program's FLOPs and HBM bytes stay ~constant as the mesh grows
        # (the collectives add bytes, hence the one-sided-ish band).
        assert r["train_flops_per_device"] == pytest.approx(base_flops, rel=0.05)
        assert r["train_bytes_per_device"] == pytest.approx(base_bytes, rel=0.15)

        # DP collective traffic = the gradient all-reduce (~ trainable
        # param bytes, f32 here) + cross-shard BN statistics + scalar
        # metrics. Band: at least the grad all-reduce, at most 3x it.
        total = sum(r["train_collective_bytes"].values())
        assert total >= r["param_bytes"], (
            f"mesh={n}: expected at least the grad all-reduce "
            f"({r['param_bytes']} B), saw {total} B")
        assert total <= 3 * r["param_bytes"], (
            f"mesh={n}: collective traffic {total} B is >3x param bytes "
            f"({r['param_bytes']} B) — a sharding regression")

        # Serving (forward + decode + NMS) is per-image: the only
        # collective is the final result replication (out_shardings=
        # replicated gathers the tiny detection tuples — measured
        # 16.8 KB at mesh=2), never the conv/NMS compute path.
        assert sum(r["serve_collective_bytes"].values()) <= 128 * 1024
