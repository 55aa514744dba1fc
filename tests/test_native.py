"""Native C++ data-loader core vs numpy/PIL reference implementations."""

import numpy as np
import pytest

from faster_rcnn_pytorch_tpu.data import native
from faster_rcnn_pytorch_tpu.data.transforms import normalize

requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@requires_native
def test_normalize_into_canvas_matches_numpy():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (37, 53, 3), np.uint8)
    got = native.normalize_into_canvas(img, 64, 64)
    want = np.zeros((64, 64, 3), np.float32)
    want[:37, :53] = normalize(img)
    np.testing.assert_allclose(got, want, atol=1e-6)


@requires_native
def test_resize_bilinear_close_to_pil():
    from PIL import Image

    rs = np.random.RandomState(1)
    img = rs.randint(0, 256, (48, 64, 3), np.uint8)
    got = native.resize_bilinear(img, 96, 128).astype(np.int16)
    want = np.asarray(
        Image.fromarray(img).resize((128, 96), Image.BILINEAR)
    ).astype(np.int16)
    # Different but equivalent bilinear conventions: allow small deviation.
    assert np.abs(got - want).mean() < 4.0


def test_fallback_works_without_library(monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    rs = np.random.RandomState(2)
    img = rs.randint(0, 256, (10, 12, 3), np.uint8)
    out = native.normalize_into_canvas(img, 16, 16)
    assert out.shape == (16, 16, 3)


def test_native_jpeg_decode_matches_pil():
    """libjpeg decode parity with PIL (which wraps the same C library;
    DCT rounding may differ by at most 1 LSB across builds)."""
    import io

    from PIL import Image

    from faster_rcnn_pytorch_tpu.data import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    rs = np.random.RandomState(5)
    img = rs.randint(0, 255, size=(37, 53, 3), dtype=np.uint8)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.jpg")
        Image.fromarray(img).save(p, quality=90)
        got = native.decode_jpeg(p)
        assert got is not None and got.shape == (37, 53, 3)
        with Image.open(p) as im:
            want = np.asarray(im.convert("RGB"))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

        # non-JPEG falls back to None -> loader uses PIL
        pp = os.path.join(d, "x.png")
        Image.fromarray(img).save(pp)
        assert native.decode_jpeg(pp) is None
        from faster_rcnn_pytorch_tpu.data.loader import load_image

        np.testing.assert_array_equal(load_image(pp), img)
        assert np.abs(
            load_image(p).astype(int) - want.astype(int)
        ).max() <= 1
