"""Inference API — the ``YOLO`` / ``YoloModel`` equivalent
(reference: code/yolo.py:51-315).

The reference wraps a batch-1 Keras model that takes raw encoded bytes
and letterboxes in-graph (yolo.py:105-112). Here the host letterboxes
(cheap, PIL/numpy) and ONE jitted XLA program runs backbone -> RFCR ->
heads -> decode -> class-aware NMS for a whole batch. Requests are
padded up to a small ladder of batch buckets (default 1/8/32/128) so
arbitrary request sizes reuse at most ``len(batch_buckets)`` compiled
programs — on this backend a fresh XLA compile costs minutes, so an
unpadded batch dim would be a serving hazard. The top bucket is 128,
not 256: measured chip-side latency is 8.2 ms at b128 vs 17.9 ms at
b256 (STATUS.md), so two 128-chunks beat one padded 256 for every
request size above 32 — XLA emits a worse program at b256 (bytes/img
45.6 -> 61+ MB, docs/design.md).

``use_int8=True`` swaps the backbone onto the W8A8 path
(nn/int8_infer.py): int8 tensors between backbone convs, calibrated on
``calibration_images`` (measured -0.0083 mAP on the int8-study recipe).

``mesh=`` (a ``jax.sharding.Mesh`` from ``parallel.make_mesh``) turns
the Predictor data-parallel: weights replicate once at construction,
every padded request batch shards over the mesh's ``data`` axis, and
XLA runs the identical program per shard with no collectives in the
hot path (decode/NMS are per-image). Batch buckets round up to
multiples of the data-axis size so every shard stays shape-static.
This is the serving-side counterpart of ``evaluate_map(mesh=)`` —
beyond the reference, whose inference stack is strictly batch-1
(code/yolo.py:51-103).
"""

from __future__ import annotations

import colorsys
import dataclasses
import time
from collections import deque
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.data.annotations import load_anchors, load_classes
from yoloret_tpu.nn import build_detector
from yoloret_tpu.ops import detect_batch
from yoloret_tpu.ops.letterbox import letterbox_numpy_u8
from yoloret_tpu.utils.checkpoint import load_params


@dataclasses.dataclass
class Detection:
    box: Tuple[float, float, float, float]  # (x1, y1, x2, y2) image pixels
    score: float
    class_id: int
    class_name: str


class Predictor:
    def __init__(
        self,
        backbone: str = "mobilenetv2x75",
        weights: Optional[str] = None,
        classes_path: Optional[str] = None,
        anchors_path: Optional[str] = None,
        class_names: Optional[Sequence[str]] = None,
        anchors: Optional[np.ndarray] = None,
        input_hw: Tuple[int, int] = (320, 320),
        score_threshold: float = 0.6,
        iou_threshold: float = 0.5,
        bf16: bool = True,
        use_ema: bool = False,
        seed: int = 0,
        zoom_ensemble: bool = False,
        zoom_hw: Tuple[int, int] = (224, 224),
        num_candidates: int = 256,  # shared-pool depth; 64 is ~16% faster
        # at serving thresholds with a measured -0.013 worst-case mAP
        # cost at threshold 0 (tools/topk_study.py)
        batch_buckets: Sequence[int] = (1, 8, 32, 128),
        inflight_chunks: int = 2,  # bound on dispatched-but-uncollected
        # top-bucket chunks: keeps host/device overlap while device
        # buffers stay O(window) instead of O(request size)
        use_int8: bool = False,  # W8A8 backbone (nn/int8_infer.py);
        # measured -0.0083 mAP on the int8-study recipe
        calibration_images: Optional[np.ndarray] = None,  # [N,H,W,3]
        # uint8/float letterbox-sized images for int8 calibration;
        # uniform noise when absent (pass real images in production)
        mesh=None,  # jax.sharding.Mesh: data-parallel serving — padded
        # batches shard over the mesh's `data` axis, weights replicate
        rfcr: str = "weighted_sum",  # RFCR fusion variant; must match
        # how the weights were trained (tools/ablation.py)
    ):
        if class_names is None:
            assert classes_path, "need class_names or classes_path"
            class_names = load_classes(classes_path)
        if anchors is None:
            assert anchors_path, "need anchors or anchors_path"
            anchors = load_anchors(anchors_path)
        self.class_names = list(class_names)
        self.anchors = np.asarray(anchors, np.float32)
        self.input_hw = tuple(input_hw)
        self.score_threshold = score_threshold
        self.iou_threshold = iou_threshold
        assert batch_buckets, "batch_buckets must be non-empty"
        self.mesh = mesh
        self._n_data = 1
        if mesh is not None:
            from yoloret_tpu.parallel import DATA_AXIS

            self._n_data = int(mesh.shape[DATA_AXIS])
        # Round every bucket up to a multiple of the data-axis size so
        # each shard keeps a static shape (dedup: 1 and 8 both -> 8 on
        # an 8-way mesh).
        nd = self._n_data
        self.batch_buckets = tuple(sorted(
            {-(-int(b) // nd) * nd for b in batch_buckets}))
        self.inflight_chunks = max(1, int(inflight_chunks))
        self.dispatched_batch_sizes: set = set()  # compiled-shape telemetry
        # One entry per jit TRACE of _infer (appended at trace time, so a
        # shape that retraces shows up twice): the ground-truth compile
        # count for the bucket-padding guarantee.
        self.traced_batch_sizes: list = []

        self.model = build_detector(
            backbone,
            num_classes=len(self.class_names),
            dtype=jnp.bfloat16 if bf16 else jnp.float32,
            rfcr=rfcr,
            # Keep heads in the compute dtype: every postprocess path
            # casts f32 on consumption (bitwise-equal to casting here —
            # nn/detector.py head_dtype), skipping an [B, N, 5+C] f32
            # materialization per batch on the serving hot path.
            head_dtype=None,
        )
        self.variables = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, *self.input_hw, 3)), False
        )
        if weights:
            restored = load_params(weights)
            if use_ema and "ema_params" in restored:
                params = restored["ema_params"]
            else:
                params = restored["params"]
            self.variables = {
                "params": params,
                "batch_stats": restored["batch_stats"],
            }

        self._put_batch = jnp.asarray
        if mesh is not None:
            from yoloret_tpu.parallel import batch_sharding, replicate

            repl = replicate(mesh)
            data_shard = batch_sharding(mesh)
            self.variables = jax.tree.map(
                lambda a: jax.device_put(a, repl), self.variables)
            self._put_batch = lambda x: jax.device_put(x, data_shard)

        anchors_j = jnp.asarray(self.anchors)
        nc = len(self.class_names)
        self.zoom_ensemble = zoom_ensemble
        zh, zw = zoom_hw

        self._qp = None
        if use_int8:
            from yoloret_tpu.nn.int8_infer import quantize_from_data

            if calibration_images is None:
                calibration_images = np.random.RandomState(0).randint(
                    0, 256, (16, *self.input_hw, 3), np.uint8)
            calib = np.asarray(calibration_images, np.float32)
            if calib.max() > 1.5:
                calib = calib / 255.0
            self._qp = quantize_from_data(self.model, self.variables, calib)
            if mesh is not None:
                from yoloret_tpu.parallel import replicate

                repl = replicate(mesh)
                self._qp = jax.tree.map(
                    lambda a: jax.device_put(jnp.asarray(a), repl), self._qp)

        @jax.jit
        def _infer(variables, images, image_hw):
            # Trace-time side effect: runs once per compiled batch shape.
            self.traced_batch_sizes.append(int(images.shape[0]))
            # images arrive uint8 (4x smaller transfer); normalize on device
            images = images.astype(jnp.float32) * (1.0 / 255.0)
            if self._qp is not None:
                from yoloret_tpu.nn.int8_infer import int8_detector_apply

                outs = int8_detector_apply(
                    self.model, variables, self._qp, images)
            else:
                outs = self.model.apply(variables, images, False)
            zoom_outs = None
            if zoom_ensemble:
                # Second pass over the CENTER CROP of the network input
                # (reference yolo.py:154-161); fully-convolutional model
                # runs at the crop resolution directly.
                h, w = images.shape[1], images.shape[2]
                y0, x0 = (h - zh) // 2, (w - zw) // 2
                crop = images[:, y0 : y0 + zh, x0 : x0 + zw, :]
                if self._qp is not None:
                    from yoloret_tpu.nn.int8_infer import int8_detector_apply

                    zoom_outs = int8_detector_apply(
                        self.model, variables, self._qp, crop)
                else:
                    zoom_outs = self.model.apply(variables, crop, False)
            return detect_batch(
                outs,
                anchors_j,
                num_classes=nc,
                image_hw=image_hw,
                score_threshold=self.score_threshold,
                iou_threshold=self.iou_threshold,
                zoom_outputs=zoom_outs,
                num_candidates=num_candidates,
            )

        self._infer = _infer

    # -- array API ----------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        """Smallest configured bucket >= n (largest bucket chunks bigger
        requests)."""
        for b in self.batch_buckets:
            if n <= b:
                return b
        return self.batch_buckets[-1]

    def detect_arrays(self, images: Sequence[np.ndarray]) -> List[List[Detection]]:
        """images: list of HWC uint8/float RGB arrays (any sizes).

        Requests larger than the top bucket are processed in top-bucket
        chunks; smaller ones are padded up to the nearest bucket (padding
        rows replicate row 0 and are dropped from the results), so every
        request size maps onto one of ``batch_buckets``' compiled shapes.
        Chunks are dispatched ahead of readback (JAX dispatch is async),
        so host letterboxing of chunk k+1 overlaps the device executing
        chunk k — but only ``inflight_chunks`` chunks are in flight at
        once, so device memory stays O(window), not O(request).
        """
        top = self.batch_buckets[-1]
        chunks = [images[s:s + top] for s in range(0, len(images), top)]
        out: List[List[Detection]] = []
        pending: deque = deque()
        for chunk in chunks:
            if len(pending) >= self.inflight_chunks:
                # Collect the oldest (long since dispatched, usually
                # done) BEFORE dispatching the next, so at most
                # inflight_chunks chunks are ever in flight.
                n, res = pending.popleft()
                out.extend(self._collect_chunk(n, res))
            pending.append((len(chunk), self._dispatch_chunk(chunk)))
        while pending:
            n, res = pending.popleft()
            out.extend(self._collect_chunk(n, res))
        return out

    def _dispatch_chunk(self, images: Sequence[np.ndarray]):
        batch = len(images)
        bucket = self._bucket_for(batch)
        lb = np.stack(
            [letterbox_numpy_u8(np.asarray(im), self.input_hw) for im in images]
        )
        hw = np.asarray([[im.shape[0], im.shape[1]] for im in images], np.float32)
        if bucket > batch:
            lb = np.concatenate(
                [lb, np.broadcast_to(lb[:1], (bucket - batch, *lb.shape[1:]))])
            hw = np.concatenate(
                [hw, np.broadcast_to(hw[:1], (bucket - batch, 2))])
        self.dispatched_batch_sizes.add(bucket)
        return self._infer(
            self.variables, self._put_batch(lb), self._put_batch(hw))

    def _collect_chunk(self, batch: int, res) -> List[List[Detection]]:
        boxes = np.asarray(res.boxes)
        scores = np.asarray(res.scores)
        classes = np.asarray(res.classes)
        valid = np.asarray(res.valid)
        out: List[List[Detection]] = []
        for i in range(batch):
            dets = []
            for b, s, c in zip(boxes[i][valid[i]], scores[i][valid[i]], classes[i][valid[i]]):
                ymin, xmin, ymax, xmax = [float(v) for v in b]
                dets.append(
                    Detection((xmin, ymin, xmax, ymax), float(s), int(c), self.class_names[int(c)])
                )
            out.append(dets)
        return out

    # -- image API (reference detect_image, yolo.py:235-315) ----------------

    def detect_image(self, image, draw: bool = True):
        """image: path or PIL.Image. Returns (PIL image, detections)."""
        from PIL import Image

        if isinstance(image, str):
            image = Image.open(image)
        image = image.convert("RGB")
        arr = np.asarray(image, np.uint8)
        t0 = time.perf_counter()
        dets = self.detect_arrays([arr])[0]
        dt = time.perf_counter() - t0
        print(f"found {len(dets)} boxes in {dt * 1e3:.1f} ms")
        if draw:
            image = draw_detections(image, dets, self.class_names)
        return image, dets

    # -- video API (reference detect_video, yolo.py:435-554) ----------------

    def detect_video(
        self,
        source,
        output: Optional[str] = None,
        max_frames: Optional[int] = None,
        track_interval: int = 1,
        max_tracks: int = 20,
    ):
        """OpenCV capture loop with FPS overlay.

        ``track_interval=1`` (default) detects every frame — on TPU the
        detector outruns any CPU tracker, so this is the native path.
        ``track_interval=N>1`` reproduces the reference's interleave
        (yolo.py:470-520: detect once, then hand each box to a CSRT
        tracker for the following frames, re-detecting every N frames).
        This build of OpenCV lacks contrib CSRT; :func:`_make_tracker`
        picks CSRT when present, else MIL — same interleave contract.
        ``max_tracks`` caps the per-cycle tracker count (tracker updates
        are host-CPU work that scales linearly with boxes).
        """
        import cv2

        cap = cv2.VideoCapture(0 if source in ("0", 0) else source)
        if not cap.isOpened():
            raise IOError(f"cannot open video source {source!r}")
        writer = None
        if output:
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            writer = cv2.VideoWriter(output, fourcc, fps, (w, h))
        n, t0 = 0, time.perf_counter()
        trackers: List[Tuple[object, Detection]] = []
        try:
            while True:
                ok, frame = cap.read()
                if not ok or (max_frames is not None and n >= max_frames):
                    break
                if track_interval <= 1 or n % track_interval == 0:
                    rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    dets = self.detect_arrays([rgb])[0]
                    if track_interval > 1:
                        trackers = []
                        h, w = frame.shape[:2]
                        for d in dets[:max_tracks]:
                            x1, y1, x2, y2 = d.box
                            x1 = max(0.0, min(x1, w - 2.0))
                            y1 = max(0.0, min(y1, h - 2.0))
                            bw = max(1.0, min(x2, w) - x1)
                            bh = max(1.0, min(y2, h) - y1)
                            t = _make_tracker(cv2)
                            t.init(frame, (int(x1), int(y1), int(bw), int(bh)))
                            trackers.append((t, d))
                else:
                    dets = []
                    kept = []
                    for t, d in trackers:
                        ok_t, (x, y, bw, bh) = t.update(frame)
                        if not ok_t:
                            continue
                        d = Detection(
                            (float(x), float(y), float(x + bw), float(y + bh)),
                            d.score, d.class_id, d.class_name,
                        )
                        kept.append((t, d))
                        dets.append(d)
                    trackers = kept
                for d in dets:
                    x1, y1, x2, y2 = [int(v) for v in d.box]
                    cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 255, 0), 2)
                    cv2.putText(
                        frame, f"{d.class_name} {d.score:.2f}", (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1,
                    )
                fps_now = (n + 1) / (time.perf_counter() - t0)
                cv2.putText(
                    frame, f"FPS: {fps_now:.1f}", (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 0, 255), 2,
                )
                if writer is not None:
                    writer.write(frame)
                n += 1
        finally:
            cap.release()
            if writer is not None:
                writer.release()
        return n


def _make_tracker(cv2):
    """Best available single-object tracker: CSRT (the reference's
    choice, yolo.py:474) when OpenCV ships contrib, else KCF, else MIL
    (always present in this image's cv2 5.0)."""
    for name in ("TrackerCSRT", "TrackerKCF", "TrackerMIL"):
        cls = getattr(cv2, name, None) or getattr(
            getattr(cv2, "legacy", None), name, None)
        if cls is not None:
            try:
                return cls.create()
            except Exception:
                pass
        fn = getattr(cv2, f"{name}_create", None)
        if fn is not None:
            return fn()
    raise RuntimeError("no OpenCV tracker implementation available")


def draw_detections(image, detections: Sequence[Detection], class_names: Sequence[str]):
    """PIL box/label drawing with per-class HSV colors
    (reference: code/yolo.py:221-233, 276-313)."""
    from PIL import ImageDraw, ImageFont

    n = max(len(class_names), 1)
    colors = [
        tuple(int(255 * v) for v in colorsys.hsv_to_rgb(i / n, 1.0, 1.0))
        for i in range(n)
    ]
    draw = ImageDraw.Draw(image)
    try:
        font = ImageFont.load_default()
    except Exception:
        font = None
    thickness = max(1, (image.size[0] + image.size[1]) // 600)
    for d in detections:
        x1, y1, x2, y2 = d.box
        color = colors[d.class_id % n]
        for t in range(thickness):
            draw.rectangle([x1 + t, y1 + t, x2 - t, y2 - t], outline=color)
        label = f"{d.class_name} {d.score:.2f}"
        draw.text((x1 + 2, max(y1 - 12, 0)), label, fill=color, font=font)
    return image
