"""2-process multi-host dryrun (CPU backend, gloo collectives).

Validates the multi-host code paths that single-host runs never execute
(the counterpart of the reference's NCCL/TCP rendezvous + pickled
all_gather, utils/__init__.py:5-23, util/misc.py:89-129):

1. ``jax.distributed.initialize`` bring-up with 2 processes x 2 CPU
   devices each (global mesh of 4),
2. loader sharding disjointness across hosts (train + test),
3. one SPMD train step over the *global* mesh with per-host batches
   placed via ``make_array_from_process_local_data`` — loss identical on
   both hosts (XLA-inserted cross-host grad reduction),
4. the pickled-allgather eval merge (CocoEvaluator
   ``synchronize_between_processes``) — both hosts end with identical
   12-stat summaries over the union of per-host predictions,
5. full SPMD evaluation over the global mesh (engine/evaluate.py with
   ``mesh=``): global eval batches assembled from per-host loader
   shards, per-host addressable-shard fetch, VOC merge — identical mAP
   on both hosts.

Run: ``python tools/dryrun_multihost.py``; writes MULTIHOST_DRYRUN.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
PORT = 29531


def make_voc_tree(root: str, n_train: int = 8, n_test: int = 6) -> None:
    import numpy as np
    from PIL import Image

    sys.path.insert(0, REPO)
    from tests.test_data import VOC_XML

    for split, n in (("VOCtrainval_2007", n_train), ("VOCtest_2007", n_test)):
        base = os.path.join(root, split, "VOCdevkit", "VOC2007")
        os.makedirs(os.path.join(base, "Annotations"), exist_ok=True)
        os.makedirs(os.path.join(base, "JPEGImages"), exist_ok=True)
        rs = np.random.RandomState(0)
        for i in range(n):
            name = f"im{i:03d}"
            with open(os.path.join(base, "Annotations", f"{name}.xml"), "w") as f:
                f.write(VOC_XML)
            img = rs.randint(0, 255, (90, 120, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(base, "JPEGImages", f"{name}.jpg")
            )


def worker(pid: int, data_root: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{PORT}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2 and jax.device_count() == 4

    import numpy as np

    from faster_rcnn_pytorch_tpu.config import Options
    from faster_rcnn_pytorch_tpu.data.loader import build_dataloader
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        LEGACY_CONFIG,
        build_model,
        init_detector_params,
    )
    from faster_rcnn_pytorch_tpu.parallel.mesh import (
        allgather_pyobj,
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

    opts = Options(
        data_type="voc",
        data_root=data_root,
        batch_size=4,
        resize=64,
        max_size=64,
        num_workers=0,
        dtype="float32",
        host_id=jax.process_index(),
        num_hosts=2,
        # per-host eval batch of 2 -> global eval batch 4 = the full
        # data axis, so the SPMD eval leg below shards one image per
        # device (wrap-padded final batches keep the count equal on
        # both hosts: 3 shard records / batch 2 -> 2 batches each)
        eval_batch_size=2,
    )
    train_loader, test_loader = build_dataloader(opts)

    # --- loader sharding disjointness (train + test) ------------------
    def epoch_ids(loader):
        ids = []
        for b in loader.epoch(0):
            ids.extend(int(i) for i in b["image_id"])
        return ids

    for name, loader in (("train", train_loader), ("test", test_loader)):
        # wrap-padding duplicates ids *within* a host; dedup per host,
        # then require across-host disjointness and full coverage.
        mine = sorted(set(epoch_ids(loader)))
        shards = allgather_pyobj(mine)
        assert not (set(shards[0]) & set(shards[1])), (
            f"{name}: overlapping shards"
        )
        n_total = len(loader.records)
        covered = len(set(shards[0]) | set(shards[1]))
        assert covered >= n_total - (opts.batch_size - 1) * 2, (
            name, covered, n_total,
        )
    print(f"[{pid}] loader sharding disjoint", flush=True)

    # --- one SPMD train step over the global 4-device mesh ------------
    mesh = make_mesh()  # multi-host: process-major global mesh
    assert mesh.devices.size == 4
    cfg = dataclasses.replace(
        LEGACY_CONFIG,
        pre_nms_train=64,
        post_nms_train=16,
        pre_nms_test=32,
        post_nms_test=8,
        roi_samples=8,
        roi_pos_quota=2,
        max_detections=4,
    )
    import jax.numpy as jnp

    model, _ = build_model("legacy", num_classes=21, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=64)
    optimizer = make_optimizer(params, make_lr_schedule("constant", 1e-3, 1, 1))
    state = replicate(init_train_state(params, optimizer), mesh)
    step_fn = make_train_step(model, cfg, optimizer, mesh)

    batch = next(iter(train_loader.epoch(0)))  # per-host batch of 2
    device_batch = shard_batch(
        {
            "image": batch["image"],
            "extent": batch["extent"].astype(np.float32),
            "gt_boxes": batch["gt_boxes"],
            "gt_labels": batch["gt_labels"],
            "gt_mask": batch["gt_mask"],
        },
        mesh,
    )
    assert device_batch["image"].shape[0] == 4  # global batch
    state, metrics = step_fn(state, device_batch, jax.random.key(1))
    loss = float(metrics["loss"])
    losses = allgather_pyobj(loss)
    assert np.isfinite(loss), loss
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    print(f"[{pid}] SPMD step over 2 hosts: loss = {loss:.4f}", flush=True)

    # --- eval merge across hosts ---------------------------------------
    from faster_rcnn_pytorch_tpu.data.coco import CocoIndex
    from faster_rcnn_pytorch_tpu.evaluation.coco_eval import CocoEvaluator

    rs = np.random.RandomState(7)
    imgs = list(range(1, 7))
    dataset = {
        "images": [{"id": i} for i in imgs],
        "annotations": [
            {
                "id": i,
                "image_id": i,
                "category_id": 1,
                "bbox": [10.0, 10.0, 50.0, 60.0],
                "area": 3000.0,
                "iscrowd": 0,
            }
            for i in imgs
        ],
        "categories": [{"id": 1, "name": "x"}],
    }
    evaluator = CocoEvaluator(CocoIndex(dataset))
    mine = [i for i in imgs if i % 2 == jax.process_index()]
    evaluator.update(
        {
            i: {
                "boxes": np.array([[10.0, 10.0, 60.0, 70.0]])
                + rs.normal(0, 2, (1, 4)),
                "scores": np.array([0.9]),
                "labels": np.array([1]),
            }
            for i in mine
        }
    )
    evaluator.synchronize_between_processes()
    assert sorted(evaluator.predictions) == imgs  # union of both hosts
    evaluator.accumulate()
    stats = evaluator.summarize()
    all_stats = allgather_pyobj(stats.tolist())
    assert np.allclose(all_stats[0], all_stats[1]), all_stats
    print(
        f"[{pid}] eval merge: {len(evaluator.predictions)} imgs, "
        f"mAP={stats[0]:.3f}",
        flush=True,
    )

    # --- SPMD evaluation over the global mesh --------------------------
    # The full evaluate() path: per-host loader shards assembled into
    # global batches (make_array_from_process_local_data), predict
    # sharded one image per device, each host fetching only its
    # addressable output shards, VOC merge via allgather_pyobj.
    from faster_rcnn_pytorch_tpu.engine.evaluate import evaluate

    eval_out = evaluate(
        model,
        cfg,
        state.params,
        test_loader,
        data_type="voc",
        score_threshold=0.0,
        mesh=mesh,
    )
    maps = allgather_pyobj(eval_out["map"])
    assert abs(maps[0] - maps[1]) < 1e-9, maps
    print(f"[{pid}] SPMD eval over 2 hosts: mAP = {eval_out['map']:.4f}", flush=True)

    print(f"DRYRUN_OK pid={pid} loss={loss:.6f} map={stats[0]:.6f}", flush=True)


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return 0

    tmp = tempfile.mkdtemp(prefix="mh_voc_")
    make_voc_tree(tmp)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(p), tmp],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
        )
        for p in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and all(
        "DRYRUN_OK" in o for o in outs
    )
    for i, o in enumerate(outs):
        with open(f"/tmp/mh_worker{i}.log", "w") as f:
            f.write(o)
        tail = "\n".join(o.strip().splitlines()[-6:])
        print(f"--- worker {i} (rc={procs[i].returncode}) ---\n{tail}")
    result = {
        "ok": ok,
        "processes": 2,
        "devices_per_process": 2,
        "summary": [
            next((l for l in o.splitlines() if l.startswith("DRYRUN_OK")), "")
            for o in outs
        ],
    }
    with open(os.path.join(REPO, "MULTIHOST_DRYRUN.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
