"""HTTP inference server (serve.py) over exported artifacts."""

import dataclasses
import io
import json
import os
import threading
import time
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    LEGACY_CONFIG,
    build_model,
    init_detector_params,
)
from faster_rcnn_pytorch_tpu.serve import (
    InferenceServer,
    MicroBatcher,
    ServerStats,
    detections_to_pixels,
    fit_scale,
    make_http_server,
    pick_bucket,
    preprocess,
)
from faster_rcnn_pytorch_tpu.serving import (
    artifact_name,
    export_predict,
    save_artifact,
    write_manifest,
)

CANVAS = 64
TINY = dataclasses.replace(
    LEGACY_CONFIG,
    num_classes=6,
    pre_nms_train=64,
    post_nms_train=16,
    pre_nms_test=32,
    post_nms_test=8,
    roi_samples=8,
    roi_pos_quota=2,
    max_detections=8,
)


def test_pick_bucket_prefers_matching_orientation():
    buckets = [(1, (64, 96)), (1, (96, 64))]
    assert pick_bucket((48, 90), buckets) == (1, (64, 96))  # landscape
    assert pick_bucket((90, 48), buckets) == (1, (96, 64))  # portrait
    # tie on fill -> smallest batch wins
    assert pick_bucket((64, 64), [(4, (64, 64)), (1, (64, 64))]) == (
        1,
        (64, 64),
    )
    with pytest.raises(ValueError):
        pick_bucket((10, 10), [])


def test_preprocess_contract():
    raw = np.full((30, 60, 3), 255, np.uint8)
    canvas, extent, scale = preprocess(raw, (64, 96))
    assert canvas.shape == (64, 96, 3) and canvas.dtype == np.float32
    assert scale == pytest.approx(fit_scale((30, 60), (64, 96)))
    nh, nw = round(30 * scale), round(60 * scale)
    assert extent == pytest.approx([nw / 96, nh / 64])
    # padding stays exactly zero; content region is normalized (nonzero)
    assert np.all(canvas[nh:, :] == 0) and np.all(canvas[:, nw:] == 0)
    assert np.all(canvas[: nh - 1, : nw - 1] != 0)


def test_detections_to_pixels_roundtrip_and_thres():
    # one valid detection covering pixels (10,5)-(50,25) of an 80x40
    # original, resized by scale into a 64x96 canvas
    scale = fit_scale((40, 80), (64, 96))
    row = np.zeros((3, 7), np.float32)
    row[0] = [10 * scale / 96, 5 * scale / 64, 50 * scale / 96,
              25 * scale / 64, 2, 0.9, 1.0]
    row[1] = [0, 0, 1, 1, 1, 0.4, 1.0]   # valid, low score
    row[2] = [0, 0, 1, 1, 0, 0.99, 0.0]  # invalid slot
    dets = detections_to_pixels(row, (64, 96), scale, (80, 40), thres=None)
    assert len(dets) == 2
    np.testing.assert_allclose(dets[0]["box"], [10, 5, 50, 25], atol=1e-3)
    assert dets[0]["label"] == 2 and dets[0]["score"] == pytest.approx(0.9)
    dets = detections_to_pixels(row, (64, 96), scale, (80, 40), thres=0.5)
    assert len(dets) == 1


BUCKET4 = (4, (8, 8))


def _echo_dispatch(calls, delay=0.0):
    """Fake dispatch: records batch sizes, echoes each slot's extent into
    its result row so per-requester routing is checkable."""

    def dispatch(bucket, images, extents):
        calls.append(images.shape[0])
        if delay:
            time.sleep(delay)
        return np.concatenate(
            [extents, images.reshape(images.shape[0], -1)[:, :1]], axis=1
        )

    return dispatch


def _run_threads(mb, n, results):
    def worker(i):
        canvas = np.full((8, 8, 3), float(i), np.float32)
        extent = np.array([i, i + 0.5], np.float32)
        try:
            results[i] = mb.run(BUCKET4, canvas, extent)
        except Exception as e:  # noqa: BLE001 (collected for assertions)
            results[i] = e

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)


def test_micro_batcher_groups_full_batch():
    calls: list[int] = []
    mb = MicroBatcher(_echo_dispatch(calls), wait_s=5.0)
    results: dict = {}
    _run_threads(mb, 4, results)
    # full bucket -> ONE dispatch of 4 (no deadline expiry involved)
    assert calls == [4]
    for i in range(4):
        row, n = results[i]
        assert n == 4
        np.testing.assert_allclose(row[:2], [i, i + 0.5])  # own slot back
        assert row[2] == float(i)  # own image in the packed batch


def test_micro_batcher_deadline_flushes_partial_group():
    calls: list[int] = []
    mb = MicroBatcher(_echo_dispatch(calls), wait_s=0.05)
    results: dict = {}
    _run_threads(mb, 2, results)  # 2 < batch 4: leader flushes at deadline
    # every dispatch is padded to the bucket batch; what varies is how
    # many dispatches the two requests needed
    sizes = sorted(results[i][1] for i in range(2))
    assert len(calls) == {(1, 1): 2, (2, 2): 1}[tuple(sizes)]
    assert sizes in ([1, 1], [2, 2])  # grouping depends on arrival timing
    for i in range(2):
        np.testing.assert_allclose(results[i][0][:2], [i, i + 0.5])


def test_micro_batcher_wait_zero_dispatches_immediately():
    calls: list[int] = []
    mb = MicroBatcher(_echo_dispatch(calls), wait_s=0.0)
    row, n = mb.run(BUCKET4, np.zeros((8, 8, 3), np.float32),
                    np.array([0.7, 0.9], np.float32))
    assert calls == [4]  # one dispatch, padded to the bucket batch
    assert n == 1
    np.testing.assert_allclose(row[:2], [0.7, 0.9])


def test_micro_batcher_propagates_dispatch_error_to_all():
    def boom(bucket, images, extents):
        raise ValueError("device fell over")

    mb = MicroBatcher(boom, wait_s=0.05)
    results: dict = {}
    _run_threads(mb, 3, results)
    for i in range(3):
        assert isinstance(results[i], ValueError)


def _fake_batch2_server(calls: list) -> InferenceServer:
    """An InferenceServer over a stubbed batch-2 artifact (no compile):
    the detector records dispatch batch sizes and emits one fixed
    detection per slot."""

    class _FakeDetector:
        manifest = {"data_type": "voc", "model_generation": "legacy"}

        @staticmethod
        def buckets():
            return [(2, (16, 16))]

        def __call__(self, images, extents):
            calls.append(images.shape[0])
            time.sleep(0.02)
            out = np.zeros((images.shape[0], 3, 7), np.float32)
            out[:, 0, 4] = 1.0  # label
            out[:, 0, 5] = 0.9  # score
            out[:, 0, 6] = 1.0  # valid
            out[:, 0, 2:4] = 0.5
            return out

    server = InferenceServer.__new__(InferenceServer)
    server.detector = _FakeDetector()
    server.default_thres = None
    server.names = ["a", "b", "c"]
    server._lock = threading.Lock()
    server._batcher = MicroBatcher(server._dispatch, wait_s=0.25)
    server.stats = ServerStats()
    return server


def test_server_batches_concurrent_requests():
    """Server-level wiring: two concurrent /detect-path calls into a
    batch-2 bucket share one underlying artifact call."""
    calls: list[int] = []
    server = _fake_batch2_server(calls)
    outs: dict = {}

    def worker(i):
        outs[i] = server.detect(_jpeg_bytes(16, 16, seed=i))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert calls == [2]  # one shared dispatch
    for i in range(2):
        assert outs[i]["batched"] == 2
        assert len(outs[i]["detections"]) == 1
        assert outs[i]["detections"][0]["name"] == "b"


def test_server_stats_percentiles_and_counters():
    s = ServerStats(window=8)
    for ms in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]:  # first two fall out
        s.record_request(float(ms), n_detections=2, group_n=1)
    s.record_dispatch()
    s.record_error()
    snap = s.snapshot()
    assert snap["requests"] == 10 and snap["errors"] == 1
    assert snap["detections"] == 20 and snap["dispatches"] == 1
    assert snap["batch_hist"] == {"1": 10}
    assert snap["latency_ms"]["window"] == 8
    assert snap["latency_ms"]["p50"] == 7.0  # sorted [3..10][4]
    assert snap["latency_ms"]["p99"] == 10.0
    empty = ServerStats().snapshot()
    assert empty["latency_ms"]["p50"] is None


def test_http_metrics_endpoint():
    calls: list[int] = []
    httpd = make_http_server(_fake_batch2_server(calls), "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            f"{base}/detect", data=_jpeg_bytes(16, 16), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            json.load(r)
        # one bad request -> error counter
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/detect", data=b"junk", method="POST"
                ),
                timeout=60,
            )
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            m = json.load(r)
        assert m["requests"] == 1 and m["errors"] == 1
        assert m["dispatches"] == 1 and m["batch_hist"] == {"1": 1}
        assert m["latency_ms"]["p50"] is not None
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_batches_concurrent_posts():
    """Live-HTTP twin: two concurrent POST /detect requests through the
    threaded HTTP server share one dispatch and report batched=2."""
    calls: list[int] = []
    httpd = make_http_server(_fake_batch2_server(calls), "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        outs: dict = {}

        def fire(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect",
                data=_jpeg_bytes(16, 16, seed=i),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                outs[i] = json.load(r)

        threads = [
            threading.Thread(target=fire, args=(i,)) for i in range(2)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        assert calls == [2]
        assert outs[0]["batched"] == 2 and outs[1]["batched"] == 2
    finally:
        httpd.shutdown()
        httpd.server_close()


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("export")
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=CANVAS)
    entries = []
    for canvas in [(CANVAS, CANVAS + 32), (CANVAS + 32, CANVAS)]:
        exp = export_predict(model, TINY, params, canvas, batch=1)
        fname = artifact_name(canvas, 1)
        save_artifact(exp, os.path.join(out, fname))
        entries.append({"file": fname, "canvas_hw": list(canvas), "batch": 1})
    write_manifest(
        str(out), entries,
        extra={"data_type": "voc", "model_generation": "legacy",
               "num_classes": 6},
    )
    return str(out)


def _jpeg_bytes(h, w, seed=0):
    from PIL import Image

    rs = np.random.RandomState(seed)
    buf = io.BytesIO()
    Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8)).save(
        buf, format="JPEG"
    )
    return buf.getvalue()


@pytest.mark.slow
def test_inference_server_detect(export_dir):
    server = InferenceServer(export_dir)
    out = server.detect(_jpeg_bytes(40, 90))
    assert out["image_wh"] == [90, 40]
    assert out["bucket"] == [1, CANVAS, CANVAS + 32]  # landscape bucket
    for d in out["detections"]:
        x1, y1, x2, y2 = d["box"]
        assert 0 <= x1 <= x2 <= 90 and 0 <= y1 <= y2 <= 40
        assert isinstance(d["name"], str)
    # an impossible cutoff removes everything
    assert server.detect(_jpeg_bytes(40, 90), thres=1.1)["detections"] == []


@pytest.mark.slow
def test_http_server_end_to_end(export_dir):
    httpd = make_http_server(InferenceServer(export_dir), "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.load(r)
        assert health["status"] == "ok"
        assert [1, CANVAS, CANVAS + 32] in health["buckets"]

        with urllib.request.urlopen(f"{base}/info", timeout=30) as r:
            assert json.load(r)["num_classes"] == 6

        req = urllib.request.Request(
            f"{base}/detect", data=_jpeg_bytes(90, 40), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        assert out["bucket"] == [1, CANVAS + 32, CANVAS]  # portrait
        assert out["image_wh"] == [40, 90]

        # bad inputs are client errors, not server crashes
        for req in [
            urllib.request.Request(f"{base}/detect", data=b"not an image",
                                   method="POST"),
            urllib.request.Request(f"{base}/detect", data=b"", method="POST"),
            urllib.request.Request(f"{base}/nope", data=b"x", method="POST"),
        ]:
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code in (400, 404)
    finally:
        httpd.shutdown()
        httpd.server_close()
