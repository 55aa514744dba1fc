"""Released-weights registry and gated downloader.

Counterpart of the reference's ``download_url_pretrained.py`` (gdown
fetch of the released demo checkpoint into ``torch.hub``'s cache,
models/model_.py:300-312) and of its implicit torchvision
``pretrained=True`` ImageNet fetches (models/model.py:275-281,
models/new_model.py:372).

Same contract as :func:`data.voc.download_voc`: idempotent (an existing
file is reused untouched), and in an egress-less environment the fetch
raises with instructions naming the URL and the destination so the user
can stage the file out of band.
"""

from __future__ import annotations

import os

# Stable public artifact URLs. The two ImageNet entries are the exact
# torchvision weight files the reference resolves through
# ``vgg16(pretrained=True)`` / ``resnet_fpn_backbone('resnet50',
# IMAGENET1K_V1)``; ``frcnn_demo`` is the repo author's released
# VOC-trained legacy detector (Google Drive id from models/model_.py:304,
# served via the gdown-style uc endpoint).
CHECKPOINTS: dict[str, tuple[str, str]] = {
    "vgg16": (
        "https://download.pytorch.org/models/vgg16-397923af.pth",
        "vgg16-397923af.pth",
    ),
    "resnet50": (
        "https://download.pytorch.org/models/resnet50-0676ba61.pth",
        "resnet50-0676ba61.pth",
    ),
    "frcnn_demo": (
        "https://drive.google.com/uc?export=download"
        "&id=14ObbUCsP7DsDd2kMcnIxJRpnAFsT-9Lj",
        "frcnn.best.pth.tar",
    ),
}

# Specs accepted by --pretrained_backbone that mean "the ImageNet weights
# for whichever backbone this generation uses" (reference: a bare
# pretrained=True flag).
_AUTO_SPECS = frozenset({"auto", "imagenet", "true", "1"})


def cache_dir() -> str:
    """Download cache (reference: ``torch.hub.get_dir()/checkpoints``).

    ``FRT_CACHE_DIR`` overrides; default ``~/.cache/faster_rcnn_pytorch_tpu``.
    """
    root = os.environ.get("FRT_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "faster_rcnn_pytorch_tpu"
    )
    return os.path.join(root, "checkpoints")


def fetch(name: str) -> str:
    """Return a local path for registry entry ``name``, downloading into
    :func:`cache_dir` if absent. Raises ``RuntimeError`` with staging
    instructions when the download fails (e.g. no network egress)."""
    try:
        url, fname = CHECKPOINTS[name]
    except KeyError:
        raise KeyError(
            f"unknown pretrained artifact {name!r}; "
            f"known: {sorted(CHECKPOINTS)}"
        ) from None
    dest = os.path.join(cache_dir(), fname)
    if os.path.exists(dest):
        return dest
    os.makedirs(cache_dir(), exist_ok=True)
    import urllib.request

    tmp = dest + ".part"
    try:
        print(f"downloading {url} -> {dest} ...")
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, dest)  # atomic: no truncated file on a re-run
    except Exception as e:  # noqa: BLE001 — any failure gets instructions
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"could not download {name!r} from {url} ({e}). If this "
            f"environment has no network egress, stage the file manually "
            f"at {dest} and re-run."
        ) from e
    return dest


def resolve_backbone(spec: str, generation: str) -> str:
    """Map a ``--pretrained_backbone`` value to a local weights path.

    * an existing path — used as-is (the round-2 behavior);
    * ``auto`` / ``imagenet`` / ``true`` / ``1`` — the ImageNet weights
      for this generation's backbone (vgg16 for legacy, resnet50 for
      fpn), fetched into the cache if needed;
    * a registry name (``vgg16`` / ``resnet50``) — that entry;
    * anything else — error (a typo'd path must not silently fall back
      to random weights).
    """
    if os.path.exists(spec):
        return spec
    low = spec.lower()
    if low in _AUTO_SPECS:
        name = "vgg16" if generation == "legacy" else "resnet50"
        return fetch(name)
    if low in CHECKPOINTS:
        return fetch(low)
    raise ValueError(
        f"--pretrained_backbone {spec!r}: not a file, not one of "
        f"{sorted(_AUTO_SPECS)} and not a registry entry "
        f"{sorted(CHECKPOINTS)}"
    )
