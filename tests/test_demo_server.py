"""Browser demo server end-to-end over HTTP on the tiny SD config
(Streamlit-demo counterpart, scripts/demo/serve.py)."""

import io
import sys
import threading
import urllib.parse
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, "scripts/demo")


@pytest.fixture(scope="module")
def server_url():
    from serve import DemoApp, make_handler

    app = DemoApp("configs/inference/sd_tiny.yaml", default_size=64)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_index_and_health(server_url):
    html = urllib.request.urlopen(server_url + "/").read().decode()
    assert "<form" in html and "sampler" in html
    import json

    health = json.loads(urllib.request.urlopen(server_url + "/health").read())
    assert health == {"ok": True}


def test_generate_txt2img_png(server_url):
    from PIL import Image

    form = urllib.parse.urlencode({
        "prompt": "", "steps": 4, "scale": 5.0,
        "width": 64, "height": 64, "seed": 1,
    }).encode()
    resp = urllib.request.urlopen(server_url + "/generate", data=form, timeout=600)
    assert resp.headers["Content-Type"] == "image/png"
    img = Image.open(io.BytesIO(resp.read()))
    assert img.size == (64, 64)
    arr = np.asarray(img)
    assert arr.shape == (64, 64, 3) and arr.std() > 0


def test_generate_img2img(tmp_path):
    # img2img needs a server whose --init-root covers the init image: paths
    # outside it are rejected (the advisor's arbitrary-path-read fix)
    from PIL import Image

    from serve import DemoApp, make_handler

    init = tmp_path / "init.png"
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 64, 3), dtype=np.uint8)
    ).save(init)
    app = DemoApp(
        "configs/inference/sd_tiny.yaml", default_size=64,
        init_root=str(tmp_path),
    )
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        form = urllib.parse.urlencode({
            "prompt": "", "steps": 4, "width": 64, "height": 64,
            "init_path": "init.png", "strength": 0.5,
        }).encode()
        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.server_address[1]}/generate",
            data=form, timeout=600,
        )
        assert resp.headers["Content-Type"] == "image/png"
    finally:
        srv.shutdown()


def test_generate_img2vid_gif(tmp_path):
    """img2vid tab: SVD config server returns an animated GIF
    (reference video_sampling.py counterpart)."""
    from PIL import Image

    from serve import DemoApp, make_handler

    init = tmp_path / "cond.png"
    Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (32, 32, 3), dtype=np.uint8)
    ).save(init)
    app = DemoApp(
        "configs/inference/svd_tiny.yaml", default_size=32,
        init_root=str(tmp_path),
    )
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        form = urllib.parse.urlencode({
            "mode": "img2vid", "steps": 2, "width": 32, "height": 32,
            "num_frames": 2, "init_path": "cond.png", "seed": 3,
        }).encode()
        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.server_address[1]}/generate",
            data=form, timeout=600,
        )
        assert resp.headers["Content-Type"] == "image/gif"
        gif = Image.open(io.BytesIO(resp.read()))
        assert gif.size == (32, 32)
        assert getattr(gif, "n_frames", 1) == 2
    finally:
        srv.shutdown()


def test_init_path_outside_root_rejected(server_url, tmp_path):
    # absolute path outside --init-root must be refused, not opened
    from PIL import Image

    init = tmp_path / "esc.png"
    Image.fromarray(
        np.zeros((16, 16, 3), dtype=np.uint8)
    ).save(init)
    form = urllib.parse.urlencode({
        "prompt": "", "steps": 2, "width": 64, "height": 64,
        "init_path": str(init),
    }).encode()
    try:
        urllib.request.urlopen(server_url + "/generate", data=form, timeout=120)
        assert False, "expected HTTP 500 (path escapes --init-root)"
    except urllib.error.HTTPError as e:
        assert e.code == 500
        import json

        assert "escapes" in json.loads(e.read())["error"]


def test_generate_error_is_json(server_url):
    form = urllib.parse.urlencode({
        "prompt": "", "steps": 4, "width": 64, "height": 64,
        "init_path": "/nonexistent/file.png",
    }).encode()
    try:
        urllib.request.urlopen(server_url + "/generate", data=form, timeout=120)
        assert False, "expected HTTP 500"
    except urllib.error.HTTPError as e:
        assert e.code == 500
        import json

        assert "error" in json.loads(e.read())
