"""Predictor batch-bucket padding: arbitrary request sizes must reuse a
small fixed set of compiled shapes (on the real backend a fresh XLA
compile costs minutes, so an unpadded batch dim is a serving hazard —
VERDICT r2 weak #5)."""

import numpy as np
import pytest

ANCHORS = np.array(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
     [116, 90], [156, 198], [373, 326]], np.float32,
)


@pytest.fixture(scope="module")
def predictor():
    from yoloret_tpu.infer import Predictor

    return Predictor(
        class_names=["a"], anchors=ANCHORS, input_hw=(64, 64),
        score_threshold=0.2, bf16=False, batch_buckets=(4, 8),
    )


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        f = np.full((100, 140, 3), 40, np.uint8)
        f[20:60, 30:90] = rng.randint(0, 255, 3)
        out.append(f)
    return out


def test_request_sizes_share_one_compiled_shape(predictor):
    """2-, 3- and 4-image requests all pad to the 4-bucket: exactly one
    jit cache entry, one dispatched batch size."""
    r2 = predictor.detect_arrays(_frames(2))
    r3 = predictor.detect_arrays(_frames(3))
    r4 = predictor.detect_arrays(_frames(4))
    assert [len(r2), len(r3), len(r4)] == [2, 3, 4]
    assert predictor.dispatched_batch_sizes == {4}
    # exactly one TRACE happened (trace-time telemetry — robust to
    # whatever global jax state other suite modules leave behind,
    # unlike PjitFunction._cache_size which reads jax internals)
    assert predictor.traced_batch_sizes == [4]


def test_padding_rows_do_not_change_results(predictor):
    """Row i of a padded request equals row i of the full-bucket request."""
    frames = _frames(4, seed=7)
    full = predictor.detect_arrays(frames)
    part = predictor.detect_arrays(frames[:2])
    for a, b in zip(part, full[:2]):
        assert len(a) == len(b)
        for da, db in zip(a, b):
            np.testing.assert_allclose(da.box, db.box, atol=1e-5)
            assert da.class_id == db.class_id


def test_oversize_requests_chunk_through_top_bucket(predictor):
    """9 images with top bucket 8 -> one 8-chunk + one padded 4-chunk."""
    out = predictor.detect_arrays(_frames(9))
    assert len(out) == 9
    assert predictor.dispatched_batch_sizes == {4, 8}
    assert sorted(predictor.traced_batch_sizes) == [4, 8]
