"""Data-parallel serving: Predictor(mesh=...) shards padded request
batches over the mesh's data axis and must produce detections identical
to the single-device Predictor (per-image postprocess — no collectives,
no numerics change). Beyond the reference, whose inference stack is
batch-1 (code/yolo.py:51-103)."""

import numpy as np
import pytest

ANCHORS = np.array(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
     [116, 90], [156, 198], [373, 326]], np.float32,
)


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        f = np.full((96, 128, 3), 40, np.uint8)
        f[20:60, 30:90] = rng.randint(0, 255, 3)
        out.append(f)
    return out


@pytest.fixture(scope="module")
def predictors():
    import jax

    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    kw = dict(
        class_names=["a"], anchors=ANCHORS, input_hw=(64, 64),
        score_threshold=0.2, bf16=False, seed=3,
    )
    single = Predictor(batch_buckets=(8, 16), **kw)
    mesh = make_mesh(jax.devices()[:8])
    # Buckets deliberately NOT multiples of 8: (1, 6, 16) must round to
    # (8, 16) on an 8-way data axis.
    dp = Predictor(batch_buckets=(1, 6, 16), mesh=mesh, **kw)
    return single, dp


def test_buckets_round_up_to_data_axis(predictors):
    _, dp = predictors
    assert dp.batch_buckets == (8, 16)
    assert dp._n_data == 8


def test_batch_input_actually_shards(predictors):
    """The device_put the serving path uses must lay the batch across
    all 8 devices (one row per device at b8)."""
    _, dp = predictors
    x = dp._put_batch(np.zeros((8, 64, 64, 3), np.uint8))
    assert len(x.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(1, 64, 64, 3)}


def test_mesh_predictor_matches_single_device(predictors):
    single, dp = predictors
    frames = _frames(5, seed=11)  # pads to the 8-bucket on both
    a = single.detect_arrays(frames)
    b = dp.detect_arrays(frames)
    assert [len(x) for x in a] == [len(x) for x in b]
    for da_list, db_list in zip(a, b):
        for da, db in zip(da_list, db_list):
            np.testing.assert_allclose(da.box, db.box, atol=1e-5)
            np.testing.assert_allclose(da.score, db.score, atol=1e-6)
            assert da.class_id == db.class_id
    assert dp.dispatched_batch_sizes == {8}
    assert dp.traced_batch_sizes == [8]


def test_mesh_predictor_chunks_oversize_requests(predictors):
    _, dp = predictors
    out = dp.detect_arrays(_frames(19, seed=5))  # 16 + padded-to-8 chunk
    assert len(out) == 19
    assert dp.dispatched_batch_sizes == {8, 16}


def test_evaluate_map_rejects_indivisible_batch(tmp_path):
    """--mesh_data evaluation with batch_size not a multiple of the data
    axis must fail fast with a clear message, not an opaque GSPMD error
    deep in device_put (advisor, round 3)."""
    import jax
    from PIL import Image

    from yoloret_tpu.data import Dataset, DatasetMode
    from yoloret_tpu.eval import evaluate_map
    from yoloret_tpu.nn import build_detector
    from yoloret_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    img = tmp_path / "im.jpg"
    Image.fromarray(np.full((64, 64, 3), 90, np.uint8)).save(img)
    ann = tmp_path / "t_1.txt"
    ann.write_text(f"{img} 5,5,40,40,0\n")
    ds = Dataset(str(ann), batch_size=3, anchors=ANCHORS, num_classes=1,
                 input_hw=(64, 64), mode=DatasetMode.TEST)
    model = build_detector("mobilenetv2x75", num_classes=1)
    import jax.numpy as jnp

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32), False)
    with pytest.raises(ValueError, match="multiple of the mesh data axis"):
        evaluate_map(model, variables, ds, ANCHORS, ["a"],
                     mesh=make_mesh(jax.devices()[:8]))
