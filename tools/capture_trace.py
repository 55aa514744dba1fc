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


def summarize(trace_dir: str, top: int = 25) -> list[dict]:
    """Convert the xplane proto to the profiler's framework-op table and
    return the top rows by total self time."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = _xplane_paths(trace_dir)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir} — trace empty?")
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "framework_op_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    # The tool emits gviz JSON ({"cols": [...], "rows": [...]}) possibly
    # with a JS prefix; find the outermost object.
    start = data.find("{")
    table = json.loads(data[start:])
    cols = [c.get("label") or c.get("id") for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        vals = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
        rows.append(dict(zip(cols, vals)))
    # keep rank/occurrence/time columns only, top-N by total self time
    key = next(
        (c for c in cols if "self" in c.lower() and "time" in c.lower()), None
    )
    if key:
        rows.sort(key=lambda r: -(r.get(key) or 0))
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
