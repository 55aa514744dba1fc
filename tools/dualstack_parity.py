"""Dual-stack mAP parity drill: the SAME weights over the SAME images
through BOTH complete eval stacks — the reference's and this repo's —
must produce the same VOC mAP.

This is the last integration risk between "real data appears" and
"numbers match": component-level parity (oracle tests) cannot catch an
eval-side contract bug like the test.py:68-71 cxcy re-conversion quirk
SURVEY.md §3.2 flags; only running both full stacks can.

Pipeline (one command):
  1. generate a 20-class shapes-VOC set (tools/make_shapes_voc
     --classes20 — all 20 VOC class names present in test GT, so the
     reference voc_eval's sorted-class indexing behaves exactly as on
     real VOC);
  2. train the repo's legacy VGG16 briefly through the unmodified train
     CLI (or take an existing run via --name/--log_dir/--skip_train);
  3. evaluate through the REPO stack: ``python -m
     faster_rcnn_pytorch_tpu.test`` (bfloat16, the production eval
     dtype — see --eval_dtype);
  4. export the same weights to a reference-layout ``.pth.tar``
     (``python -m faster_rcnn_pytorch_tpu.export --export_torch``);
  5. evaluate through the REFERENCE stack verbatim on torch-CPU:
     /root/reference models/model.py FRCNN.predict (strict-loaded
     checkpoint) + evaluation/evaluator.py Evaluator('voc') +
     evaluation/voc_eval.py — the legacy path test.py:13-164 scored the
     published VOC numbers with — using the exactness torchvision stubs
     (tests/reference_loader.py: numpy RoIPool oracle, greedy NMS);
  6. compare: |mAP_repo - mAP_ref| must be <= --tol; write
     DUALSTACK_PARITY.json.

At --resize 320 on the 320x320 shapes images the resize is the
identity, so both stacks consume bit-identical normalized pixels and
any mAP gap isolates to model numerics (TPU f32 vs torch-CPU f32) and
evaluator conventions (the reference's +1-extent IoU / raw-XML gt
coords vs this repo's exact-extent IoU / minus-1 gt contract — a known,
bounded sub-pixel divergence recorded in the artifact).

Run (on the TPU host):
  python tools/dualstack_parity.py --out DUALSTACK_PARITY.json
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import subprocess
import sys
import tempfile
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _run_cli(
    args: list[str],
    timeout: int = 3600,
    env_extra=None,
    allow_retry: bool = False,
) -> str:
    """Run a repo CLI as a subprocess, return stdout (raise on rc!=0).

    The tunnelled TPU plugin occasionally fails to register its platform
    while another process tears down its chip attachment; that transient
    gets one retry after a pause — but ONLY when the caller marks the
    command retry-safe (read-only eval/export). State-mutating commands
    (train, dataset generation) must not silently re-run against a
    possibly partially-written output dir (ADVICE r4).
    """
    # PREPEND to PYTHONPATH: the tunnelled TPU plugin rides in via the
    # ambient PYTHONPATH (/root/.axon_site sitecustomize); replacing the
    # variable would silently drop the TPU backend from subprocesses.
    parent_pp = os.environ.get("PYTHONPATH", "")
    pp = REPO + (os.pathsep + parent_pp if parent_pp else "")
    env = dict(os.environ, PYTHONPATH=pp, **(env_extra or {}))
    print(f"[dualstack] $ {' '.join(args)}", flush=True)
    for attempt in (0, 1):
        out = subprocess.run(
            [sys.executable, *args],
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        if out.returncode == 0:
            return out.stdout
        transient = "Unable to initialize backend" in (out.stderr or "")
        if attempt == 0 and transient and allow_retry:
            print("[dualstack] backend init failed; retrying in 30s", flush=True)
            time.sleep(30)
            continue
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError(f"command failed rc={out.returncode}: {args}")
    raise AssertionError("unreachable")


def _resize_hw(w: int, h: int, resize: int, max_size: int) -> tuple[int, int]:
    """Min-side resize with max-side cap (transforms_.py:61-127
    semantics). Identity for the drill's canonical 320x320 @ 320."""
    scale = resize / min(w, h)
    if scale * max(w, h) > max_size:
        scale = max_size / max(w, h)
    return round(w * scale), round(h * scale)


@contextlib.contextmanager
def _pycocotools_stub():
    """evaluation/evaluator.py imports pycocotools at module scope for
    its COCO branch; the VOC branch never touches it. pycocotools is
    not installed in this image — give the import a bare stub."""
    pc = types.ModuleType("pycocotools")
    pc_eval = types.ModuleType("pycocotools.cocoeval")
    pc_eval.COCOeval = object
    names = ("pycocotools", "pycocotools.cocoeval")
    saved = {k: sys.modules.get(k) for k in names}
    sys.modules["pycocotools"] = pc
    sys.modules["pycocotools.cocoeval"] = pc_eval
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _alias_voc_dirname(data_root: str) -> None:
    """Evaluator.evaluate hardcodes the real VOC archive's directory
    name (evaluation/evaluator.py:69); alias the shapes tree to it."""
    legacy_name = os.path.join(data_root, "VOCtest_06-Nov-2007")
    if not os.path.exists(legacy_name):
        os.symlink(
            os.path.join(data_root, "VOCtest_2007"),
            legacy_name,
            target_is_directory=True,
        )


def reference_voc_map(data_root: str, infos: list[tuple]) -> tuple[float, str]:
    """Feed per-image ``(boxes01, labels, scores, name, (w, h))`` tuples
    through the reference's VOC evaluator verbatim
    (evaluation/evaluator.py Evaluator('voc') + voc_eval). Returns
    ``(mAP, printed per-class output)``. Self-contained: stubs
    pycocotools and puts /root/reference on sys.path if needed (also
    usable standalone by the evaluator-parity test)."""
    added_path = REFERENCE not in sys.path
    if added_path:
        sys.path.insert(0, REFERENCE)
    try:
        with _pycocotools_stub():
            import evaluation.evaluator as ref_evaluator_mod
    finally:
        if added_path:
            sys.path.remove(REFERENCE)

    _alias_voc_dirname(data_root)
    evaluator = ref_evaluator_mod.Evaluator(data_type="voc")
    for info in infos:
        evaluator.get_info(info)
    # voc_eval writes its .cache_dir relative to CWD.
    dataset_shim = types.SimpleNamespace(root=data_root)
    cwd = os.getcwd()
    buf = io.StringIO()
    with tempfile.TemporaryDirectory(prefix="dualstack_ref_") as tmp:
        try:
            os.chdir(tmp)
            with contextlib.redirect_stdout(buf):
                ref_map = evaluator.evaluate(dataset_shim)
        finally:
            os.chdir(cwd)
    return float(ref_map), buf.getvalue()


def reference_eval(
    data_root: str, ckpt_path: str, resize: int, max_size: int, thres: float
) -> dict:
    """Run the reference eval stack verbatim (torch-CPU): legacy
    FRCNN.predict per image -> Evaluator('voc').get_info ->
    evaluate() -> voc_eval mAP. Returns {"map", "per_class_ap",
    "n_images", "n_detections"}."""
    import torch
    from PIL import Image

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from reference_loader import reference_modules

    test_dir = os.path.join(data_root, "VOCtest_2007", "VOCdevkit", "VOC2007")
    jpgs = sorted(
        f
        for f in os.listdir(os.path.join(test_dir, "JPEGImages"))
        if f.endswith(".jpg")
    )
    opts = types.SimpleNamespace(thres=thres)
    n_det = 0
    infos = []
    dets: list[dict] = []  # original-pixel copies for cross-stack diffing

    try:
        with _pycocotools_stub(), reference_modules() as ref:
            model = ref.model.FRCNN(num_classes=21)
            blob = torch.load(ckpt_path, map_location="cpu")
            model.load_state_dict(blob["model_state_dict"])  # strict
            model.eval()

            with torch.no_grad():
                for i, fname in enumerate(jpgs):
                    img = Image.open(
                        os.path.join(test_dir, "JPEGImages", fname)
                    ).convert("RGB")
                    w, h = img.size
                    nw, nh = _resize_hw(w, h, resize, max_size)
                    if (nw, nh) != (w, h):
                        img = img.resize((nw, nh), Image.BILINEAR)
                    x = np.asarray(img, np.float32) / 255.0
                    x = (x - IMAGENET_MEAN) / IMAGENET_STD
                    x = torch.from_numpy(
                        np.ascontiguousarray(x.transpose(2, 0, 1))
                    )[None]
                    boxes, labels, scores = model.predict(x, opts)
                    n_det += len(scores)
                    # test.py legacy-path contract: predict's [0,1] xyxy
                    # boxes + the image's ORIGINAL (w, h) go to the
                    # accumulator; save_pred rescales (voc_eval.py:90-95).
                    infos.append((boxes, labels, scores, fname[:-4], (w, h)))
                    dets.append(
                        {
                            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4)
                            * np.array([w, h, w, h], np.float32),
                            "labels": np.asarray(labels, np.int64).reshape(-1),
                            "scores": np.asarray(scores, np.float32).reshape(-1),
                        }
                    )
                    if (i + 1) % 20 == 0:
                        print(
                            f"[dualstack] reference predict {i + 1}/"
                            f"{len(jpgs)}",
                            flush=True,
                        )

            ref_map, printed = reference_voc_map(data_root, infos)
            sys.stdout.write(printed)
    finally:
        for k in ("evaluation", "evaluation.evaluator", "evaluation.voc_eval"):
            sys.modules.pop(k, None)

    per_class = {
        name: float(ap) / 100.0
        for ap, name in re.findall(r"([\d.]+)% = (\S+) AP", printed)
    }
    return {
        "map": float(ref_map),
        "per_class_ap": per_class,
        "n_images": len(jpgs),
        "n_detections": int(n_det),
        "detections": dets,  # index-aligned with sorted test stems
    }


def _greedy_match(da: dict, db: dict, iou_thr: float = 0.75):
    """Greedy same-label box matching between two stacks' detections for
    one image (original-pixel xyxy). Returns (n_matched, score_deltas,
    box_linf_deltas)."""
    na, nb = len(da["scores"]), len(db["scores"])
    if na == 0 or nb == 0:
        return 0, [], []
    A, B = da["boxes"], db["boxes"]
    inter_w = np.maximum(
        0,
        np.minimum(A[:, None, 2], B[None, :, 2])
        - np.maximum(A[:, None, 0], B[None, :, 0]),
    )
    inter_h = np.maximum(
        0,
        np.minimum(A[:, None, 3], B[None, :, 3])
        - np.maximum(A[:, None, 1], B[None, :, 1]),
    )
    inter = inter_w * inter_h
    area_a = (A[:, 2] - A[:, 0]) * (A[:, 3] - A[:, 1])
    area_b = (B[:, 2] - B[:, 0]) * (B[:, 3] - B[:, 1])
    iou = inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)
    iou = np.where(
        da["labels"][:, None] == db["labels"][None, :], iou, 0.0
    )
    used_b = np.zeros(nb, bool)
    matched, sdel, bdel = 0, [], []
    for i in np.argsort(-da["scores"]):
        j = int(np.argmax(np.where(used_b, -1.0, iou[i])))
        if not used_b[j] and iou[i, j] >= iou_thr:
            used_b[j] = True
            matched += 1
            sdel.append(abs(float(da["scores"][i]) - float(db["scores"][j])))
            bdel.append(float(np.max(np.abs(A[i] - B[j]))))
    return matched, sdel, bdel


def decompose_gap(repo_dump_path: str, ref_dets: list[dict]) -> dict:
    """Detection-level diff between the repo stack's ``--dump_detections``
    pickle (img_id = sorted-stem index, data/voc.py:101-125) and the
    reference stack's index-aligned detections. Distinguishes a diffuse
    numerics residual (high matched fraction, tiny score deltas) from a
    structural predict-path divergence (systematic unmatched boxes)."""
    import pickle

    with open(repo_dump_path, "rb") as f:
        repo = pickle.load(f)["predictions"]
    n_repo = n_ref = n_match = 0
    sdel: list[float] = []
    bdel: list[float] = []
    for i, rd in enumerate(ref_dets):
        pi = repo.get(i)
        if pi is None:
            continue
        da = {
            "boxes": np.asarray(pi["boxes"], np.float32).reshape(-1, 4),
            "labels": np.asarray(pi["labels"], np.int64).reshape(-1),
            "scores": np.asarray(pi["scores"], np.float32).reshape(-1),
        }
        m, s, b = _greedy_match(da, rd)
        n_repo += len(da["scores"])
        n_ref += len(rd["scores"])
        n_match += m
        sdel += s
        bdel += b
    return {
        "repo_n_detections": int(n_repo),
        "reference_n_detections": int(n_ref),
        "matched_pairs": int(n_match),
        "matched_frac_of_ref": round(n_match / max(n_ref, 1), 4),
        "mean_abs_score_delta": round(float(np.mean(sdel)), 5) if sdel else None,
        "p99_abs_score_delta": (
            round(float(np.percentile(sdel, 99)), 5) if sdel else None
        ),
        "mean_box_linf_px": round(float(np.mean(bdel)), 3) if bdel else None,
        "match_iou_thr": 0.75,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="/tmp/shapes_voc20")
    p.add_argument("--n_train", type=int, default=800)
    p.add_argument("--n_test", type=int, default=160)
    p.add_argument("--resize", type=int, default=320)
    p.add_argument("--max_size", type=int, default=512)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--thres", type=float, default=0.05)
    p.add_argument("--tol", type=float, default=0.02)
    p.add_argument(
        "--tol_fp32", type=float, default=0.01,
        help="tighter bound for the float32 repo leg (numerics-only "
        "gap vs the torch-fp32 reference stack)",
    )
    p.add_argument("--name", default="dualstack")
    p.add_argument("--log_dir", default="/tmp/dualstack_logs")
    p.add_argument("--test_epoch", default="best")
    p.add_argument(
        "--eval_dtype", default="bfloat16",
        help="comma-separated repo-stack eval dtypes, one leg each "
        "(e.g. 'bfloat16,float32'; bfloat16 = production default)",
    )
    p.add_argument(
        "--skip_train",
        action="store_true",
        help="reuse the existing {log_dir}/{name} run",
    )
    p.add_argument(
        "--ref_parallel",
        action="store_true",
        help="run the torch export + torch-CPU reference eval concurrently"
        " with the repo TPU legs (disjoint resources: the reference stack"
        " never touches the chip; halves the post-train wall clock on a"
        " 1-core host)",
    )
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    if not os.path.isdir(
        os.path.join(args.root, "VOCtest_2007", "VOCdevkit", "VOC2007")
    ):
        _run_cli(
            [
                os.path.join(REPO, "tools", "make_shapes_voc.py"),
                args.root,
                str(args.n_train),
                str(args.n_test),
                "--classes20",
            ]
        )

    common = [
        "--data_type", "voc",
        "--data_root", args.root,
        "--resize", str(args.resize),
        "--max_size", str(args.max_size),
        "--name", args.name,
        "--log_dir", args.log_dir,
    ]
    if not args.skip_train:
        _run_cli(
            [
                "-m", "faster_rcnn_pytorch_tpu.main",
                *common,
                "--epoch", str(args.epochs),
                "--batch_size", str(args.batch_size),
                "--lr", str(args.lr),
            ],
            timeout=5400,
        )

    # Repo stack, one leg per requested dtype. bfloat16 is the
    # PRODUCTION eval dtype (also what the train run's per-epoch evals
    # compiled, so the compile cache is warm); the float32 leg isolates
    # the dtype gap from convention deltas against the torch-fp32
    # reference — it carries the tighter --tol_fp32 bound (VERDICT r4:
    # parity must be demonstrated where it has teeth) and is a fresh
    # multi-ten-minute compile through the tunnel on a cold cache.
    ckpt_path = os.path.join(
        args.log_dir, args.name, "dualstack_export.pth.tar"
    )

    def _export_and_reference_eval() -> dict:
        # CPU backend: the conversion reads the .ckpt from disk and
        # writes torch tensors — fetching 550 MB of params through the
        # TPU tunnel would dominate, and no device compute is involved.
        _run_cli(
            [
                "-m", "faster_rcnn_pytorch_tpu.export",
                *common,
                "--test_epoch", args.test_epoch,
                "--dtype", "float32",
                "--export_torch", ckpt_path,
            ],
            timeout=1200,
            env_extra={"JAX_PLATFORMS": "cpu"},
            allow_retry=True,
        )
        return reference_eval(
            args.root, ckpt_path, args.resize, args.max_size, args.thres
        )

    ref_future = None
    if args.ref_parallel:
        from concurrent.futures import ThreadPoolExecutor

        ref_future = ThreadPoolExecutor(max_workers=1).submit(
            _export_and_reference_eval
        )

    repo_maps: dict[str, float] = {}
    dump_paths: dict[str, str] = {}
    for eval_dtype in [
        d.strip() for d in args.eval_dtype.split(",") if d.strip()
    ]:
        dump_paths[eval_dtype] = os.path.join(
            args.log_dir, args.name, f"repo_dets_{eval_dtype}.pkl"
        )
        # The float32 leg claims parity against a TRUE-fp32 torch stack,
        # so it must not run the TPU default bf16-multiply MXU schedule
        # (jax default precision). "high" (bf16_3x: three bf16 passes
        # reconstructing ~fp32 products, rel. error ~1e-6) is the
        # practical choice: "highest" compiles for 30+ minutes through
        # this host (measured round 5, killed) while "high" compiles
        # like a normal program and its numerics are indistinguishable
        # from fp32 at detection-score resolution.
        precision = ["--matmul_precision", "high"] if (
            eval_dtype == "float32"
        ) else []
        repo_out = _run_cli(
            [
                "-m", "faster_rcnn_pytorch_tpu.test",
                *common,
                "--test_epoch", args.test_epoch,
                "--thres", str(args.thres),
                "--dtype", eval_dtype,
                "--dump_detections", dump_paths[eval_dtype],
                *precision,
            ],
            timeout=5400,
            allow_retry=True,
        )
        m = re.search(r"mAP = ([\d.]+)", repo_out)
        if not m:
            sys.stderr.write(repo_out[-2000:])
            raise RuntimeError("repo test CLI printed no mAP")
        repo_maps[eval_dtype] = float(m.group(1))
        print(
            f"[dualstack] repo mAP ({eval_dtype}) = {repo_maps[eval_dtype]}",
            flush=True,
        )
    # Headline leg: float32 when present (tightest claim), else first.
    headline = "float32" if "float32" in repo_maps else next(iter(repo_maps))
    repo_map = repo_maps[headline]

    ref = (
        ref_future.result()
        if ref_future is not None
        else _export_and_reference_eval()
    )
    # Per-leg verdicts: float32 carries the tight bound (numerics-only
    # gap vs torch-fp32), bfloat16 the production-dtype bound.
    legs = {}
    for eval_dtype, rmap in repo_maps.items():
        tol = args.tol_fp32 if eval_dtype == "float32" else args.tol
        legs[eval_dtype] = {
            "repo_map": round(rmap, 4),
            "abs_delta": round(abs(rmap - ref["map"]), 4),
            "tolerance": tol,
            "ok": bool(abs(rmap - ref["map"]) <= tol),
        }
    delta = abs(repo_map - ref["map"])
    ok = all(leg["ok"] for leg in legs.values())
    decomposition = None
    if os.path.exists(dump_paths.get(headline, "")):
        decomposition = decompose_gap(
            dump_paths[headline], ref["detections"]
        )
        print(f"[dualstack] decomposition: {decomposition}", flush=True)
    result = {
        "repo_map": round(repo_map, 4),
        "headline_dtype": headline,
        "legs": legs,
        "reference_map": round(ref["map"], 4),
        "abs_delta": round(delta, 4),
        "tolerance": args.tol_fp32 if headline == "float32" else args.tol,
        "parity_ok": ok,
        "reference_per_class_ap": {
            k: round(v, 4) for k, v in ref["per_class_ap"].items()
        },
        "n_test_images": ref["n_images"],
        "reference_n_detections": ref["n_detections"],
        "decomposition": decomposition,
        "config": {
            "dataset": "shapes_voc 20-class (tools/make_shapes_voc --classes20)",
            "n_train": args.n_train,
            "n_test": args.n_test,
            "resize": args.resize,
            "epochs": args.epochs,
            "thres": args.thres,
            "checkpoint": ckpt_path,
            "repo_stack": (
                "faster_rcnn_pytorch_tpu.test CLI "
                f"(legs: {', '.join(repo_maps)}; float32 leg at "
                "--matmul_precision highest = true-fp32 MXU schedule)"
            ),
            "reference_stack": (
                "models/model.py FRCNN.predict + evaluation/evaluator.py "
                "Evaluator('voc') + voc_eval, torch-CPU, exactness stubs"
            ),
        },
        "known_convention_deltas": (
            "reference voc_eval uses +1-extent IoU on raw-XML (1-based) "
            "gt coords; repo uses exact-extent IoU on the minus-1 parsed "
            "contract — sub-pixel matcher divergence, bounded by tol"
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    if not ok:
        print(
            f"[dualstack] PARITY FAILURE: |{repo_map:.4f} - "
            f"{ref['map']:.4f}| = {delta:.4f} > {args.tol}",
            file=sys.stderr,
        )
        return 1
    print(
        f"[dualstack] parity ok: repo {repo_map:.4f} vs reference "
        f"{ref['map']:.4f} (delta {delta:.4f} <= {args.tol})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
