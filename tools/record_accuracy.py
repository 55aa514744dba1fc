"""Append a training run's per-epoch mAP curve to ACCURACY_SHAPES.json.

Parses the ``epoch N: mAP = X`` lines that ``main.py`` prints after each
per-epoch evaluation (main.py:202) out of a captured run log, and records
the run under a named entry in the repo-root accuracy ledger.

Usage:
    python tools/record_accuracy.py NAME LOGFILE \
        --task "synthetic shapes-VOC ..." --recipe "..." --command "..."

The ledger format is ``{"runs": {name: entry, ...}}``; re-recording an
existing name overwrites it (useful while a run is still appending).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

LEDGER = pathlib.Path(__file__).resolve().parent.parent / "ACCURACY_SHAPES.json"
EPOCH_RE = re.compile(r"^epoch (\d+): mAP = ([0-9.]+)\s*$", re.M)


def parse_curve(text: str) -> list[float]:
    """Per-epoch mAP values, ordered by epoch index (last value wins
    per epoch, so resumed runs don't duplicate entries)."""
    by_epoch: dict[int, float] = {}
    for m in EPOCH_RE.finditer(text):
        by_epoch[int(m.group(1))] = float(m.group(2))
    return [by_epoch[e] for e in sorted(by_epoch)]


def load_ledger() -> dict:
    if not LEDGER.exists():
        return {"runs": {}}
    data = json.loads(LEDGER.read_text())
    if "runs" not in data:  # legacy single-run layout
        name = "legacy_voc_shapes"
        data = {"runs": {name: data}}
    return data


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", help="ledger key, e.g. fpn_voc_shapes")
    ap.add_argument("logfile", help="captured stdout of a main.py run")
    ap.add_argument("--task", default="", help="dataset / split description")
    ap.add_argument("--recipe", default="", help="model + optimizer recipe")
    ap.add_argument("--command", default="", help="exact reproduction command")
    ap.add_argument(
        "--metric",
        default="VOC AP50",
        help="what 'mAP' means for this run (VOC AP50 / COCO mAP@[.5:.95])",
    )
    args = ap.parse_args()

    text = pathlib.Path(args.logfile).read_text(errors="replace")
    curve = parse_curve(text)
    if not curve:
        raise SystemExit(f"no 'epoch N: mAP = X' lines found in {args.logfile}")

    entry = {
        "task": args.task,
        "recipe": args.recipe,
        "command": args.command,
        "metric": args.metric,
        "map_by_epoch": curve,
        "final_map": curve[-1],
        "best_map": max(curve),
    }
    # COCO runs: the evaluator's 12-stat summary prints per epoch
    # (coco_eval.py print_summary); record the LAST epoch's AP50/AP75
    # so the ledger entries stay comparable across generations.
    # Sign-aware match: the COCO evaluator prints -1.000 as the
    # empty-bucket sentinel; record those as null, never as 1.0
    # (ADVICE r4: the unsigned regex dropped the minus sign).
    ap50 = re.findall(r"AP@\.50\s+= (-?[0-9.]+)", text)
    ap75 = re.findall(r"AP@\.75\s+= (-?[0-9.]+)", text)
    if ap50:
        v = float(ap50[-1])
        entry["final_ap50"] = v if v >= 0 else None
    if ap75:
        v = float(ap75[-1])
        entry["final_ap75"] = v if v >= 0 else None
    ledger = load_ledger()
    ledger["runs"][args.name] = entry
    LEDGER.write_text(json.dumps(ledger, indent=1) + "\n")
    print(
        f"recorded {args.name}: {len(curve)} epochs, "
        f"final {curve[-1]:.4f}, best {max(curve):.4f}"
    )


if __name__ == "__main__":
    main()
