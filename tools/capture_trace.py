"""Capture a jax.profiler trace of the two flagship paths and emit a
per-op summary table.

Independent witness for the chaintime attribution (DESIGN.md §6): the
chain-timed stage tables are built from slope measurements; a real
device trace validates (or corrects) the dispatch-floor and fusion
claims with the profiler's own per-op accounting.

Runs legacy train b4 and FPN predict b2 (the two paths the README perf
table leads with) for a few steps each under ``jax.profiler.trace``,
then converts the xplane proto with tensorboard_plugin_profile into a
framework-op table and prints the top rows as markdown + JSON.

Run on the chip:  python tools/capture_trace.py [outdir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/frt_trace"
STEPS = 6


def _run_legacy_train(trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        init_detector_params,
    )
    from faster_rcnn_pytorch_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_batch,
    )
    from faster_rcnn_pytorch_tpu.parallel.train_step import (
        init_train_state,
        make_lr_schedule,
        make_optimizer,
        make_train_step,
    )

    batch_size, canvas, max_gt = 4, 800, 24
    model, cfg = build_model("legacy", num_classes=21)
    rs = np.random.RandomState(0)
    params = init_detector_params(model, jax.random.key(0))
    opt = make_optimizer(params, make_lr_schedule("constant", 1e-3, 1, 1))
    mesh = make_mesh(1)
    state = replicate(init_train_state(params, opt), mesh)
    step = make_train_step(model, cfg, opt, mesh)

    xy1 = rs.uniform(0, 0.5, size=(batch_size, max_gt, 2))
    wh = rs.uniform(0.05, 0.4, size=(batch_size, max_gt, 2))
    base = {
        "image": rs.normal(size=(batch_size, canvas, canvas, 3)).astype(np.float32),
        "extent": np.ones((batch_size, 2), np.float32),
        "gt_boxes": np.concatenate([xy1, np.minimum(xy1 + wh, 1.0)], -1).astype(
            np.float32
        ),
        "gt_labels": rs.randint(0, 20, size=(batch_size, max_gt)).astype(np.int32),
        "gt_mask": (np.arange(max_gt)[None, :] < 12).repeat(batch_size, 0),
    }
    batches = [
        shard_batch({**base, "image": base["image"] + 0.001 * i}, mesh)
        for i in range(STEPS + 2)
    ]
    jax.block_until_ready(batches)
    rng = jax.random.key(0)
    # warm (compile) outside the trace
    for i in range(2):
        state, metrics = step(state, batches[i], rng)
    np.asarray(jax.tree.leaves(metrics)[0])

    with jax.profiler.trace(trace_dir):
        for i in range(STEPS):
            state, metrics = step(state, batches[2 + i], rng)
        np.asarray(jax.tree.leaves(metrics)[0])


def _run_fpn_predict(trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        init_detector_params,
        predict,
    )
    from faster_rcnn_pytorch_tpu.utils.params import (
        cast_inference_params,
        model_compute_dtype,
    )

    batch_size, canvas = 2, 800
    model, cfg = build_model("fpn", num_classes=91)
    rs = np.random.RandomState(0)
    params = cast_inference_params(
        init_detector_params(model, jax.random.key(0)), model_compute_dtype(model)
    )
    images = [
        jnp.asarray(
            rs.normal(size=(batch_size, canvas, canvas, 3)).astype(np.float32)
        )
        + 0.001 * i
        for i in range(STEPS + 2)
    ]
    extents = jnp.ones((batch_size, 2), jnp.float32)
    jax.block_until_ready(images)

    @jax.jit
    def fn(params, im, ex):
        return model.apply(params, cfg, im, ex, method=predict)

    for i in range(2):
        out = fn(params, images[i], extents)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    with jax.profiler.trace(trace_dir):
        for i in range(STEPS):
            out = fn(params, images[2 + i], extents)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])


def _xplane_paths(trace_dir: str) -> list[str]:
    return sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
        )
    )


# ---- minimal protobuf wire-format reader for XSpace ----
#
# The image's tensorboard_plugin_profile converter is unusable here (its
# pywrap entry point is absent from the installed TF build, and no
# xplane_pb2 module ships anywhere), so the xplane.pb is read with a
# ~60-line wire-format walker over the stable XSpace schema
# (tsl/profiler/protobuf/xplane.proto): XSpace.planes=1; XPlane{name=2,
# lines=3, event_metadata=4(map: key=1,value=2; XEventMetadata{id=1,
# name=2})}; XLine{name=2, events=4}; XEvent{metadata_id=1,
# duration_ps=3}.


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message."""
    i, n = 0, len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                val |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            val = buf[i : i + ln]
            i += ln
        elif wire == 5:  # fixed32
            val = bytes(buf[i : i + 4])
            i += 4
        elif wire == 1:  # fixed64
            val = bytes(buf[i : i + 8])
            i += 8
        else:
            raise ValueError(f"wire type {wire}")
        yield field, wire, val


def _parse_plane(buf: memoryview) -> dict:
    name = ""
    meta: dict[int, str] = {}
    per_op_ps: dict[int, int] = {}
    per_op_n: dict[int, int] = {}
    for field, wire, val in _fields(buf):
        if field == 2 and wire == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 4 and wire == 2:  # event_metadata map entry
            mid, mname = 0, ""
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 2 and w3 == 2:
                            mname = bytes(v3).decode("utf-8", "replace")
            meta[mid] = mname
        elif field == 3 and wire == 2:  # XLine
            for f2, w2, v2 in _fields(val):
                if f2 == 4 and w2 == 2:  # XEvent
                    mid = dur = 0
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    per_op_ps[mid] = per_op_ps.get(mid, 0) + dur
                    per_op_n[mid] = per_op_n.get(mid, 0) + 1
    return {
        "plane": name,
        "ops": [
            {
                "op": meta.get(mid, f"#{mid}"),
                "total_ms": ps / 1e9,
                "count": per_op_n[mid],
            }
            for mid, ps in per_op_ps.items()
        ],
    }


def summarize(trace_dir: str, top: int = 25) -> list[dict]:
    """Aggregate per-op durations from the device planes of every
    xplane.pb under ``trace_dir``; top rows by total time."""
    paths = _xplane_paths(trace_dir)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir} — trace empty?")
    rows: list[dict] = []
    for path in paths:
        buf = memoryview(open(path, "rb").read())
        for field, wire, val in _fields(buf):  # XSpace.planes = 1
            if field == 1 and wire == 2:
                plane = _parse_plane(val)
                pname = plane["plane"]
                # device planes only (host/python lines are not the
                # witness we need)
                if not ("TPU" in pname or "/device" in pname.lower()):
                    continue
                for op in plane["ops"]:
                    rows.append({"plane": pname, **op})
    rows.sort(key=lambda r: -r["total_ms"])
    return rows[:top]


def main() -> None:
    from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable

    _enable()
    os.makedirs(OUT, exist_ok=True)
    result = {}
    for name, fn in (
        ("legacy_train_b4", _run_legacy_train),
        ("fpn_predict_b2", _run_fpn_predict),
    ):
        tdir = os.path.join(OUT, name)
        os.makedirs(tdir, exist_ok=True)
        print(f"[trace] running {name} ...", flush=True)
        fn(tdir)
        try:
            rows = summarize(tdir)
        except Exception as e:  # noqa: BLE001 — record the failure mode
            rows = [{"error": str(e)}]
        result[name] = rows
        print(f"[trace] {name}: {len(rows)} op rows", flush=True)

    out_path = os.path.join(OUT, "trace_summary.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[trace] wrote {out_path}")
    for name, rows in result.items():
        print(f"\n### {name} (top ops by self time)")
        for r in rows[:12]:
            print("  " + json.dumps(r, default=str)[:160])


if __name__ == "__main__":
    main()
