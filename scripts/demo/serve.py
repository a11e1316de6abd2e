"""Interactive browser demo: txt2img / img2img / img2vid over the API.

Counterpart of the reference's Streamlit demos (scripts/demo/sampling.py,
video_sampling.py, streamlit_helpers.py:478-798) — Streamlit isn't in the
image, so this is a dependency-free stdlib HTTP app: a form for prompt /
sampler / steps / scale / size / seed, rendering PNGs (or an animated GIF
for img2vid) from `SamplingPipeline`.

    python scripts/demo/serve.py --config configs/inference/sd_tiny.yaml \
        [--ckpt checkpoints/sd21.safetensors] [--port 7860]

The model loads once at startup; requests serialize through a lock (one
chip). img2img takes a server-side image path in the `init_path` field
(strength maps to skipped steps, inference/api.py:204-228). img2vid needs
the server started with an SVD config (e.g. configs/inference/svd.yaml)
and uses `init_path` as the conditioning frame
(reference video_sampling.py:136-142).
"""

import argparse
import io
import json
import os
import sys
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

_PAGE = """<!doctype html>
<html><head><title>vidseg_diffusion_tpu demo</title><style>
body {{ font-family: sans-serif; max-width: 720px; margin: 2em auto; }}
label {{ display: inline-block; width: 9em; }}
input, select {{ margin: 0.2em 0; }}
img {{ max-width: 100%; border: 1px solid #ccc; margin-top: 1em; }}
</style></head><body>
<h2>vidseg_diffusion_tpu &mdash; diffusion demo</h2>
<form method="post" action="/generate">
<div><label>mode</label><select name="mode">
  <option value="auto">auto (img2img if init path set)</option>
  <option value="txt2img">txt2img</option>
  <option value="img2img">img2img</option>
  <option value="img2vid">img2vid (SVD config)</option>
</select></div>
<div><label>prompt</label><input name="prompt" size="50" value="{prompt}"></div>
<div><label>negative prompt</label><input name="negative" size="50" value=""></div>
<div><label>sampler</label><select name="sampler">{samplers}</select></div>
<div><label>steps</label><input name="steps" type="number" value="25" min="1" max="100"></div>
<div><label>cfg scale</label><input name="scale" value="5.0"></div>
<div><label>width</label><input name="width" type="number" value="{w}" step="64"></div>
<div><label>height</label><input name="height" type="number" value="{h}" step="64"></div>
<div><label>seed</label><input name="seed" type="number" value="0"></div>
<div><label>init image path</label><input name="init_path" size="40" value="">
     <label>strength</label><input name="strength" value="0.75" size="5"></div>
<div><label>frames (img2vid)</label><input name="num_frames" type="number" value="14" min="2">
     <label>motion bucket</label><input name="motion_bucket_id" type="number" value="127"></div>
<div><button type="submit">Generate</button></div>
</form>
{image}
</body></html>
"""


class DemoApp:
    def __init__(self, config: str, ckpt=None, default_size: int = 512,
                 init_root: str = "."):
        import jax  # noqa: F401  (defer heavy imports to startup)

        from vidseg_diffusion_tpu.engine.build import build_pipeline
        from vidseg_diffusion_tpu.inference.api import SamplingPipeline

        self.pipeline = build_pipeline(config, ckpt_path=ckpt)
        self.api = SamplingPipeline(self.pipeline)
        self.default_size = default_size
        self.lock = threading.Lock()
        self.bpe_path = None  # default vocab resolution (io/tokenizer.py)
        self.init_root = init_root

    def _tokens(self, text: str, batch: int = 1):
        from vidseg_diffusion_tpu.io.tokenizer import tokenize, tokenize_empty

        if not text.strip():
            return tokenize_empty(batch)
        return tokenize([text.strip()] * batch, bpe_path=self.bpe_path)

    def _resolve_init_path(self, init_path: str) -> str:
        # remote clients may only name files under the allowed root
        # (default CWD): the field is otherwise an arbitrary-path read
        # primitive into PIL for anyone who can reach the socket
        root = os.path.realpath(self.init_root)
        resolved = os.path.realpath(os.path.join(root, init_path))
        if os.path.commonpath([resolved, root]) != root:
            raise PermissionError(
                f"init image path escapes --init-root ({root})"
            )
        return resolved

    def _load_init(self, init_path: str, width: int, height: int):
        import numpy as np
        from PIL import Image

        img = Image.open(init_path).convert("RGB").resize((width, height))
        return np.asarray(img, np.float32)[None] / 127.5 - 1.0

    def generate_video(self, form: dict) -> bytes:
        """img2vid tab: SVD image→video, returned as an animated GIF
        (reference video_sampling.py's save_video_as_grid_and_mp4 writes
        mp4; GIF keeps this server dependency-free)."""
        import jax
        import numpy as np

        from vidseg_diffusion_tpu.inference.api import VideoSamplingParams

        init_path = form.get("init_path", "").strip()
        if not init_path:
            raise ValueError("img2vid needs an init image path")
        vparams = VideoSamplingParams(
            width=int(form.get("width", self.default_size)),
            height=int(form.get("height", self.default_size)),
            steps=int(form.get("steps", 25)),
            num_frames=int(form.get("num_frames", 14)),
            motion_bucket_id=int(form.get("motion_bucket_id", 127)),
            cond_aug=float(form.get("cond_aug", 0.02)),
        )
        arr = self._load_init(
            self._resolve_init_path(init_path), vparams.width, vparams.height
        )
        rng = jax.random.PRNGKey(int(form.get("seed", 0)))
        with self.lock:
            out = self.api.image_to_video(vparams, arr, rng=rng)
        frames = (np.asarray(out) * 255).astype(np.uint8)
        from PIL import Image

        pil = [Image.fromarray(f) for f in frames]
        buf = io.BytesIO()
        pil[0].save(
            buf, format="GIF", save_all=True, append_images=pil[1:],
            duration=int(1000 / max(int(form.get("fps_id", 6)) + 1, 1)),
            loop=0,
        )
        return buf.getvalue()

    def generate(self, form: dict) -> bytes:
        import jax
        import numpy as np

        from vidseg_diffusion_tpu.inference.api import Sampler, SamplingParams

        params = SamplingParams(
            width=int(form.get("width", self.default_size)),
            height=int(form.get("height", self.default_size)),
            steps=int(form.get("steps", 25)),
            scale=float(form.get("scale", 5.0)),
            sampler=Sampler(form.get("sampler", Sampler.EULER_EDM.value)),
            img2img_strength=float(form.get("strength", 0.75)),
        )
        rng = jax.random.PRNGKey(int(form.get("seed", 0)))
        tokens = self._tokens(form.get("prompt", ""))
        neg = self._tokens(form.get("negative", ""))
        mode = form.get("mode", "auto")
        init_path = form.get("init_path", "").strip()
        if mode == "txt2img":
            init_path = ""
        elif mode == "img2img" and not init_path:
            raise ValueError("img2img needs an init image path")
        if init_path:
            init_path = self._resolve_init_path(init_path)
        with self.lock:
            if init_path:
                arr = self._load_init(init_path, params.width, params.height)
                out = self.api.image_to_image(params, arr, tokens, neg, rng=rng)
            else:
                out = self.api.text_to_image(params, tokens, neg, rng=rng)
        frame = (np.asarray(out[0]) * 255).astype(np.uint8)
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="PNG")
        return buf.getvalue()


def make_handler(app: DemoApp):
    from vidseg_diffusion_tpu.inference.api import Sampler

    options = "".join(
        f'<option value="{s.value}">{s.name}</option>' for s in Sampler
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _page(self, image_html=""):
            html = _PAGE.format(
                prompt="", samplers=options, image=image_html,
                w=app.default_size, h=app.default_size,
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(html)))
            self.end_headers()
            self.wfile.write(html)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._page()
            elif self.path == "/health":
                body = json.dumps({"ok": True}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/generate":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            form = dict(urllib.parse.parse_qsl(self.rfile.read(n).decode()))
            is_video = form.get("mode") == "img2vid"
            try:
                png = (
                    app.generate_video(form) if is_video else app.generate(form)
                )
            except Exception as e:  # surface errors to the browser
                body = json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header(
                "Content-Type", "image/gif" if is_video else "image/png"
            )
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/inference/sd_2_1.yaml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--size", type=int, default=512)
    # loopback by default: the server is unauthenticated, so external
    # exposure (--host 0.0.0.0) must be an explicit operator choice
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument(
        "--init-root", default=".",
        help="directory init-image paths are confined to (img2img)",
    )
    args = p.parse_args()

    app = DemoApp(
        args.config, args.ckpt, default_size=args.size, init_root=args.init_root
    )
    server = ThreadingHTTPServer((args.host, args.port), make_handler(app))
    print(f"demo up at http://localhost:{args.port}/", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
