"""Live preview (io/preview.py) -- the --window feature."""

import io
import json
import urllib.request

import numpy as np
import pytest

from simple_spectral_tpu.io.preview import AnsiPreview, HttpPreview, open_preview


def _frame(h=8, w=6):
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_http_preview_roundtrip():
    pv = HttpPreview(port=0, quiet=True)
    try:
        base = f"http://127.0.0.1:{pv.port}"
        # no frame yet -> 404
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/frame.png", timeout=10)

        frame = _frame()
        pv.update(frame, spp_done=4, spp_total=64)

        from PIL import Image

        png = urllib.request.urlopen(f"{base}/frame.png", timeout=10).read()
        got = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        np.testing.assert_array_equal(got, frame)

        st = json.loads(urllib.request.urlopen(f"{base}/status.json", timeout=10).read())
        assert st == {"spp_done": 4, "spp_total": 64, "frame_id": 1}

        page = urllib.request.urlopen(f"{base}/", timeout=10).read().decode()
        assert "frame.png" in page and "status.json" in page
    finally:
        pv.close()


def test_http_preview_frame_updates():
    pv = HttpPreview(port=0, quiet=True)
    try:
        base = f"http://127.0.0.1:{pv.port}"
        pv.update(_frame(), 1, 2)
        pv.update(np.zeros((4, 4, 3), np.uint8), 2, 2)
        st = json.loads(urllib.request.urlopen(f"{base}/status.json", timeout=10).read())
        assert st["frame_id"] == 2 and st["spp_done"] == 2
        from PIL import Image

        png = urllib.request.urlopen(f"{base}/frame.png", timeout=10).read()
        assert np.asarray(Image.open(io.BytesIO(png))).max() == 0
    finally:
        pv.close()


def test_ansi_preview_draws_half_blocks():
    buf = io.StringIO()
    pv = AnsiPreview(max_cols=6, max_rows=4, out=buf)
    pv.update(_frame(8, 6), spp_done=3, spp_total=9)
    out = buf.getvalue()
    assert "▀" in out and "\x1b[38;2;" in out and "\x1b[48;2;" in out
    assert "3 / 9 spp" in out
    # 8 pixel rows -> 4 text rows; second update rewinds the cursor in place
    assert out.count("▀") == 4 * 6
    pv.update(_frame(8, 6))
    assert "\x1b[5A" in buf.getvalue()


def test_open_preview_kinds():
    pv = open_preview("http", port=0, quiet=True)
    assert isinstance(pv, HttpPreview)
    pv.close()
    with pytest.raises(ValueError):
        open_preview("glfw")


def test_progressive_on_pass_hook():
    """run(on_pass=...) fires once per pass -- the hook --window rides on."""
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.render.progressive import ProgressiveRenderer

    cfg = RenderConfig(scene="cornell", mode="rgb", width=8, height=8, spp=4,
                       max_depth=3)
    pr = ProgressiveRenderer(cfg, spp_per_pass=2)
    seen = []
    pr.run(on_pass=lambda p: seen.append(p.spp_done))
    assert seen == [2, 4]
    assert pr.image_u8().shape == (8, 8, 4)
