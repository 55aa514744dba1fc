"""Released-weights registry / gated downloader (utils/pretrained.py).

Counterpart of the reference's download_url_pretrained.py + the implicit
torchvision pretrained=True fetches. All tests run offline: the cache-hit
path needs no network, and failure paths are driven with file:// URLs.
"""

import os

import pytest
import torch

from faster_rcnn_pytorch_tpu.utils import pretrained as pt


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("FRT_CACHE_DIR", str(tmp_path))
    return tmp_path / "checkpoints"


def test_cache_dir_env_override(cache):
    assert pt.cache_dir() == str(cache)


def test_fetch_reuses_existing_file(cache):
    cache.mkdir(parents=True)
    staged = cache / pt.CHECKPOINTS["vgg16"][1]
    staged.write_bytes(b"weights")
    assert pt.fetch("vgg16") == str(staged)
    assert staged.read_bytes() == b"weights"  # untouched


def test_fetch_unknown_name():
    with pytest.raises(KeyError, match="unknown pretrained artifact"):
        pt.fetch("nope")


def test_fetch_failure_names_url_and_dest(cache, monkeypatch):
    # file:// to a nonexistent path fails fast and deterministically
    # (no network dependence), exercising the egress-less error path.
    monkeypatch.setitem(
        pt.CHECKPOINTS, "vgg16", ("file:///nonexistent/x.pth", "x.pth")
    )
    with pytest.raises(RuntimeError, match="stage the file manually"):
        pt.fetch("vgg16")
    assert not os.path.exists(cache / "x.pth.part")  # no truncated leftover


def _fake_ckpt_bytes() -> bytes:
    """Plausible checkpoint payload: zip magic + padding past the
    minimum-size validation threshold."""
    return b"PK\x03\x04" + b"\0" * pt.MIN_ARTIFACT_BYTES


def test_fetch_downloads_via_url(cache, tmp_path):
    src = tmp_path / "src.pth"
    payload = _fake_ckpt_bytes()
    src.write_bytes(payload)
    pt.CHECKPOINTS["_test"] = (f"file://{src}", "dl.pth")
    try:
        dest = pt.fetch("_test")
    finally:
        del pt.CHECKPOINTS["_test"]
    assert open(dest, "rb").read() == payload


def test_fetch_rejects_implausible_bytes(cache, tmp_path):
    """A body that is neither zip nor pickle nor tar (e.g. a proxy's
    plain-text error) must never be cached."""
    src = tmp_path / "src.pth"
    src.write_bytes(b"Bandwidth limit exceeded")
    pt.CHECKPOINTS["_test"] = (f"file://{src}", "dl.pth")
    try:
        with pytest.raises(RuntimeError, match="unrecognized leading bytes"):
            pt.fetch("_test")
    finally:
        del pt.CHECKPOINTS["_test"]
    assert not os.path.exists(cache / "dl.pth")
    assert not os.path.exists(cache / "dl.pth.part")


def test_fetch_rejects_truncated_zip(cache, tmp_path):
    """Right magic but implausibly small → rejected, not cached."""
    src = tmp_path / "src.pth"
    src.write_bytes(b"PK\x03\x04tiny")
    pt.CHECKPOINTS["_test"] = (f"file://{src}", "dl.pth")
    try:
        with pytest.raises(RuntimeError, match="implausibly small"):
            pt.fetch("_test")
    finally:
        del pt.CHECKPOINTS["_test"]
    assert not os.path.exists(cache / "dl.pth")


class _DriveHandler:
    """Request handler factory simulating Google Drive's large-file
    confirm-token interstitial (what gdown exists to handle,
    reference download_url_pretrained.py:6-17)."""

    import http.server as _hs

    @classmethod
    def make(cls, mode: str, payload: bytes):
        class H(cls._hs.BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep pytest output clean
                pass

            def do_GET(self):
                import urllib.parse

                q = urllib.parse.parse_qs(
                    urllib.parse.urlparse(self.path).query
                )
                confirmed = (
                    "confirm" in q or self.path.startswith("/download")
                )
                if confirmed and mode != "html_forever":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "application/octet-stream"
                    )
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                if mode == "form":
                    # NB: mixed attribute orders on purpose — Drive's
                    # markup does not guarantee type-before-name, so the
                    # client must parse, not pattern-match.
                    body = (
                        b"<!DOCTYPE html><html><body>"
                        b"<form id=\"download-form\" action=\"/download\" method=\"get\">"
                        b"<input type=\"hidden\" name=\"id\" value=\"14Obb\">"
                        b"<input name=\"export\" type=\"hidden\" value=\"download\">"
                        b"<input value=\"t\" name=\"confirm\" type=\"hidden\">"
                        b"<input name=\"uuid\" value=\"ab-12\" type=\"hidden\">"
                        b"</form></body></html>"
                    )
                elif mode == "href":
                    body = (
                        b"<html><body><a href=\"/uc?export=download"
                        b"&amp;confirm=abCD12&amp;id=14Obb\">Download anyway"
                        b"</a></body></html>"
                    )
                else:  # html_forever: captive page with no continuation
                    body = b"<html><body>Please sign in</body></html>"
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return H


@pytest.fixture()
def fake_drive():
    """Yields a factory: start a local server in ``mode`` and return its
    base URL; all servers are torn down at test end."""
    import http.server
    import threading

    servers = []

    def start(mode: str, payload: bytes = b"") -> str:
        srv = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), _DriveHandler.make(mode, payload)
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return f"http://127.0.0.1:{srv.server_address[1]}"

    yield start
    for srv in servers:
        srv.shutdown()
        srv.server_close()


@pytest.mark.parametrize("mode", ["form", "href"])
def test_fetch_follows_drive_interstitial(cache, fake_drive, mode):
    """The confirm-token interstitial (hidden-input form or confirm=
    href) is followed to the real bytes, which are validated and
    cached."""
    payload = _fake_ckpt_bytes()
    base = fake_drive(mode, payload)
    pt.CHECKPOINTS["_drive"] = (f"{base}/uc?export=download&id=14Obb", "d.pth.tar")
    try:
        dest = pt.fetch("_drive")
    finally:
        del pt.CHECKPOINTS["_drive"]
    assert open(dest, "rb").read() == payload


def test_fetch_never_caches_interstitial(cache, fake_drive):
    """A captive HTML page with no download continuation raises and
    leaves the cache empty — the round-2 poisoning bug (plain
    urlretrieve would have os.replace'd the HTML into the cache)."""
    base = fake_drive("html_forever")
    pt.CHECKPOINTS["_drive"] = (f"{base}/uc?export=download&id=14Obb", "d.pth.tar")
    try:
        with pytest.raises(RuntimeError, match="HTML"):
            pt.fetch("_drive")
    finally:
        del pt.CHECKPOINTS["_drive"]
    assert not os.path.exists(cache / "d.pth.tar")
    assert not os.path.exists(cache / "d.pth.tar.part")


def test_resolve_backbone_path_passthrough(tmp_path):
    p = tmp_path / "w.pth"
    p.write_bytes(b"x")
    assert pt.resolve_backbone(str(p), "legacy") == str(p)


@pytest.mark.parametrize(
    "spec,generation,name",
    [
        ("auto", "legacy", "vgg16"),
        ("imagenet", "fpn", "resnet50"),
        ("vgg16", "fpn", "vgg16"),  # explicit registry name wins
    ],
)
def test_resolve_backbone_specs(cache, spec, generation, name):
    cache.mkdir(parents=True)
    staged = cache / pt.CHECKPOINTS[name][1]
    staged.write_bytes(b"w")
    assert pt.resolve_backbone(spec, generation) == str(staged)


def test_resolve_backbone_typo_raises():
    with pytest.raises(ValueError, match="not a file"):
        pt.resolve_backbone("/no/such/weights.pth", "legacy")


@pytest.mark.slow
def test_checkpoint_pretrained_sentinel(cache):
    """--checkpoint pretrained fetches the released demo detector and
    imports it (reference models/model_.py:300-312 pretrained=True).
    Staged offline via the reverse exporter's .pth.tar round-trip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from faster_rcnn_pytorch_tpu.config import Options
    from faster_rcnn_pytorch_tpu.main import init_params
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        init_detector_params,
    )
    from faster_rcnn_pytorch_tpu.utils import checkpoint as ck

    model, _ = build_model("legacy", num_classes=21, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=64)
    cache.mkdir(parents=True)
    ck.save_torch_checkpoint(
        str(cache / pt.CHECKPOINTS["frcnn_demo"][1]), params, "legacy"
    )

    opts = Options(checkpoint="pretrained", num_classes=21)
    out = init_params(model, opts)
    assert opts.checkpoint.endswith("frcnn.best.pth.tar")
    np.testing.assert_allclose(
        np.asarray(out["params"]["cls_head"]["kernel"]),
        np.asarray(params["params"]["cls_head"]["kernel"]),
        atol=1e-6,
    )


def test_load_pretrained_backbone_accepts_auto_spec(cache, monkeypatch):
    """--pretrained_backbone auto end-to-end: the staged vgg16 file in
    the cache feeds the ImageNet importer exactly like an explicit path
    (reference: vgg16(pretrained=True), models/model.py:275-281)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        init_detector_params,
    )
    from faster_rcnn_pytorch_tpu.utils import checkpoint as ck
    from tests.test_pretrained_backbone import build_torch_vgg16_features

    cache.mkdir(parents=True)
    tv = build_torch_vgg16_features()
    torch.save(tv.state_dict(), cache / pt.CHECKPOINTS["vgg16"][1])

    model, _ = build_model("legacy", num_classes=3, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=64)
    out = ck.load_pretrained_backbone(params, "auto", "legacy")
    w = tv.state_dict()["features.0.weight"].numpy()  # OIHW
    got = out["params"]["extractor"]["conv0"]["kernel"]  # HWIO
    assert jnp.allclose(got, jnp.asarray(w.transpose(2, 3, 1, 0))), (
        "conv0 kernel must come from the staged ImageNet file"
    )
