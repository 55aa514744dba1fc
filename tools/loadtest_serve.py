"""Measure serve.py throughput at the HTTP boundary under concurrent load.

bench.py measures the jitted predict roofline; this tool measures what a
CLIENT sees through the full serving stack — HTTP parse, JPEG decode,
resize + normalize, bucket routing, (optional) micro-batching, the AOT
artifact dispatch, and response JSON — with N concurrent connections.
The gap between this and the bench roofline is the serving overhead;
the ``--batch_wait_ms`` sweep quantifies the micro-batching win on real
exported artifacts (DESIGN.md §6 records the results).

Usage (artifacts exported first via ``python -m
faster_rcnn_pytorch_tpu.export``):

  python tools/loadtest_serve.py --export_dir /tmp/export_legacy_b4 \
      --concurrency 8 --duration 20 --batch_wait_ms 0,5

Prints one JSON line per ``batch_wait_ms`` setting:
  {"batch_wait_ms": 5, "concurrency": 8, "requests": N, "rps": ...,
   "p50_ms": ..., "p90_ms": ..., "p99_ms": ..., "dispatches": ...,
   "mean_group": ...}

The server is spawned and torn down per setting (one chip: the server
serializes device work; concurrency beyond the batch size only feeds
the micro-batcher).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_payloads(n: int, hw: tuple[int, int], seed: int = 0) -> list[bytes]:
    """Distinct JPEG bodies (textured noise) at the given size."""
    from PIL import Image

    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        arr = rs.randint(0, 256, size=(hw[0], hw[1], 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        out.append(buf.getvalue())
    return out


def wait_healthy(url: str, timeout_s: float) -> None:
    deadline = time.time() + timeout_s
    last = None
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(url + "/healthz", timeout=5) as r:
                if r.status == 200:
                    return
        except (urllib.error.URLError, ConnectionError, OSError) as e:
            last = e
        time.sleep(0.5)
    raise RuntimeError(f"server never became healthy: {last}")


def run_clients(
    url: str, payloads: list[bytes], concurrency: int, duration_s: float
) -> list[float]:
    """N threads POSTing /detect until the deadline; returns latencies (s)."""
    latencies: list[float] = []
    lock = threading.Lock()
    deadline = time.time() + duration_s
    errors: list[str] = []

    def worker(wid: int) -> None:
        i = wid
        while time.time() < deadline:
            body = payloads[i % len(payloads)]
            i += concurrency
            req = urllib.request.Request(
                url + "/detect",
                data=body,
                headers={"Content-Type": "application/octet-stream"},
            )
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    r.read()
            except (urllib.error.URLError, ConnectionError, OSError) as e:
                with lock:
                    errors.append(str(e))
                continue
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(concurrency)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        sys.stderr.write(
            f"[loadtest] {len(errors)} request errors, first: {errors[0]}\n"
        )
    return latencies


def loadtest_one(
    export_dir: str,
    port: int,
    wait_ms: float,
    concurrency: int,
    duration_s: float,
    payloads: list[bytes],
    startup_timeout: float,
) -> dict:
    cmd = [
        sys.executable, "-m", "faster_rcnn_pytorch_tpu.serve",
        "--export_dir", export_dir,
        "--host", "127.0.0.1",
        "--port", str(port),
        "--batch_wait_ms", str(wait_ms),
    ]
    # Prepend (not replace): the TPU plugin rides in via the ambient
    # PYTHONPATH (/root/.axon_site sitecustomize).
    parent_pp = os.environ.get("PYTHONPATH", "")
    pp = REPO + (os.pathsep + parent_pp if parent_pp else "")
    env = dict(os.environ, PYTHONPATH=pp)
    proc = subprocess.Popen(
        cmd, cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    url = f"http://127.0.0.1:{port}"
    try:
        wait_healthy(url, startup_timeout)
        # Warm every client path once before the timed window.
        run_clients(url, payloads, concurrency, duration_s=2.0)
        # /metrics counters are cumulative since server start; snapshot
        # before AND after the timed window and report the difference so
        # dispatches/batch_hist describe exactly the timed requests, not
        # the warm-up traffic (ADVICE r4).
        with urllib.request.urlopen(url + "/metrics", timeout=10) as r:
            metrics_pre = json.loads(r.read())
        t0 = time.perf_counter()
        lats = run_clients(url, payloads, concurrency, duration_s)
        elapsed = time.perf_counter() - t0
        with urllib.request.urlopen(url + "/metrics", timeout=10) as r:
            metrics_post = json.loads(r.read())
        pre_hist = metrics_pre.get("batch_hist", {})
        metrics = {
            "dispatches": metrics_post.get("dispatches", 0)
            - metrics_pre.get("dispatches", 0),
            "batch_hist": {
                k: v - pre_hist.get(k, 0)
                for k, v in metrics_post.get("batch_hist", {}).items()
                if v - pre_hist.get(k, 0) > 0
            },
        }
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()

    lats_ms = np.sort(np.asarray(lats)) * 1e3
    dispatches = metrics.get("dispatches", 0)
    # serve.py's batch_hist counts REQUESTS by the size of the group
    # they rode in; the request-weighted mean is the effective batching.
    hist = metrics.get("batch_hist", {})
    n_hist = sum(hist.values())
    mean_group = (
        round(sum(int(k) * v for k, v in hist.items()) / n_hist, 2)
        if n_hist
        else None
    )
    row = {
        "batch_wait_ms": wait_ms,
        "concurrency": concurrency,
        "duration_s": round(elapsed, 2),
        "requests": len(lats),
        "rps": round(len(lats) / elapsed, 2) if elapsed else 0.0,
        "p50_ms": round(float(np.percentile(lats_ms, 50)), 1) if len(lats) else None,
        "p90_ms": round(float(np.percentile(lats_ms, 90)), 1) if len(lats) else None,
        "p99_ms": round(float(np.percentile(lats_ms, 99)), 1) if len(lats) else None,
        "dispatches": dispatches,
        "mean_group": mean_group,
    }
    return row


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--export_dir", required=True)
    ap.add_argument("--port", type=int, default=8731)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument(
        "--batch_wait_ms", default="0,5",
        help="comma-separated settings; server restarted per setting",
    )
    ap.add_argument("--image_hw", default="800,800")
    ap.add_argument(
        "--startup_timeout", type=float, default=900.0,
        help="artifact load + warmup dispatch can compile on first run",
    )
    args = ap.parse_args(argv)

    hw = tuple(int(v) for v in args.image_hw.split(","))
    payloads = make_payloads(8, hw)
    for i, wait_ms in enumerate(
        float(v) for v in args.batch_wait_ms.split(",")
    ):
        row = loadtest_one(
            args.export_dir,
            args.port + i,
            wait_ms,
            args.concurrency,
            args.duration,
            payloads,
            args.startup_timeout,
        )
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
