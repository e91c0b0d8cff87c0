"""Serving app (reference rife_app/app.py:21-460).

Two frontends over the same service layer:

- Gradio Blocks UI with the reference's five tabs (frame extraction,
  image-pair -> video, chained 3-video transitions, multi-pass video
  interpolation, re-encoding), degraded mode when the model fails to
  load, optional basic auth via AUTH_USERNAME/AUTH_PASSWORD
  (app.py:26-30,442-451) — used when gradio is importable.
- A stdlib http.server JSON API fallback (this image has no gradio), so
  the service layer is always drivable:
      GET  /health
      POST /interpolate_pair   {img0_path, img1_path, passes, fps, out}
      POST /interpolate_video  {path, exp, out}
      POST /chain              {videos: [...], out}
      POST /reencode           {path, out}
"""
from __future__ import annotations

import base64
import hmac
import json
import os
import traceback
from pathlib import Path

import numpy as np

from rife_tpu.serve import config
from rife_tpu.serve import services


def load_engine(model_dir=None):
    """Engine with checkpoint auto-detect; None on failure (degraded mode,
    reference app.py:26-30)."""
    from rife_tpu.cli.interp_img import build_engine

    try:
        model_dir = str(model_dir or config.MODEL_DIR)
        ckpt = None
        if os.path.isdir(model_dir):
            for cand in ("flownet.rtpu", "flownet.pkl"):
                p = os.path.join(model_dir, cand)
                if os.path.exists(p):
                    ckpt = p
                    break
        eng = build_engine(ckpt, None, 1.0, "bfloat16",
                           fast=config.FAST_MODE)
        # Deployments must be able to see which graph they serve: the
        # fast rung is an env-controlled default (round-4 ADVICE #4).
        print(f"[rife_tpu] serving graph: "
              f"{'bit-exact' if not config.FAST_MODE else f'fast rung {int(config.FAST_MODE)}'}"
              f" (RIFE_TPU_FAST={os.environ.get('RIFE_TPU_FAST', '<unset, default 1>')}),"
              f" model={eng.model_name}, dtype={eng.compute_dtype}", flush=True)
        return eng
    except Exception:
        traceback.print_exc()
        return None


# ---------------------------------------------------------------- HTTP API


class _Api:
    """JSON API over the service layer.

    Request-supplied filesystem paths are CONFINED: inputs must resolve
    under `upload_dir`, outputs under `output_dir` — a network peer must
    not be able to read or overwrite arbitrary files the process can
    reach (round-1 advisor finding).
    """

    def __init__(self, engine, upload_dir=None, output_dir=None):
        self.engine = engine
        self.upload_dir = Path(upload_dir or config.UPLOAD_DIR).resolve()
        self.output_dir = Path(output_dir or config.OUTPUT_DIR).resolve()

    def _in_path(self, p) -> str:
        q = Path(p).resolve()
        if not q.is_relative_to(self.upload_dir):
            raise PermissionError(f"input path outside upload dir: {p}")
        return str(q)

    def _out_path(self, p, default_name: str) -> str:
        if not p:
            return str(self.output_dir / default_name)
        q = Path(p).resolve()
        if not q.is_relative_to(self.output_dir):
            raise PermissionError(f"output path outside output dir: {p}")
        return str(q)

    def health(self, _=None):
        return {"status": "ok" if self.engine else "degraded",
                "model": getattr(self.engine, "model_name", None)}

    def interpolate_pair(self, body):
        from rife_tpu.utils import read_image

        img0, _ = read_image(self._in_path(body["img0_path"]))
        img1, _ = read_image(self._in_path(body["img1_path"]))
        out = self._out_path(body.get("out"), "pair.mp4")
        return services.interpolate_pair_to_video(
            self.engine, img0, img1, out,
            passes=int(body.get("passes", 4)), fps=float(body.get("fps", config.DEFAULT_FPS)),
            disk_based=bool(body.get("disk_based", False)),
        )

    def interpolate_video(self, body):
        out = self._out_path(body.get("out"), "video.mp4")
        return services.interpolate_video_file(
            self.engine, self._in_path(body["path"]), out, exp=int(body.get("exp", 1))
        )

    def chain(self, body):
        out = self._out_path(body.get("out"), "chained.mp4")
        videos = [self._in_path(v) for v in body["videos"]]
        return services.chained_transitions(self.engine, videos, out)

    def reencode(self, body):
        out = self._out_path(body.get("out"), "reencoded.mp4")
        return services.reencode_video(self._in_path(body["path"]), out)


def serve_http(engine, host: str, port: int, *, upload_dir=None,
               output_dir=None, auth=None):
    """Stdlib JSON API. `auth` is (user, password) — defaults to the
    AUTH_USERNAME/AUTH_PASSWORD env pair (same contract the reference
    wires into gradio, app.py:442-451); when set, every request must
    carry HTTP basic auth."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    if auth is None and config.AUTH_USERNAME and config.AUTH_PASSWORD:
        auth = (config.AUTH_USERNAME, config.AUTH_PASSWORD)
    expected = None
    if auth:
        expected = "Basic " + base64.b64encode(
            f"{auth[0]}:{auth[1]}".encode()).decode()

    api = _Api(engine, upload_dir=upload_dir, output_dir=output_dir)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _authed(self) -> bool:
            if expected is None:
                return True
            got = self.headers.get("Authorization", "")
            if hmac.compare_digest(got, expected):
                return True
            self.send_response(401)
            self.send_header("WWW-Authenticate", 'Basic realm="rife_tpu"')
            self.send_header("Content-Length", "0")
            self.end_headers()
            return False

        def do_GET(self):
            if not self._authed():
                return
            if self.path == "/health":
                self._send(200, api.health())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if not self._authed():
                return
            name = self.path.strip("/")
            fn = getattr(api, name, None)
            if fn is None or name.startswith("_") or not callable(fn):
                self._send(404, {"error": f"unknown endpoint {self.path}"})
                return
            if api.engine is None and name != "reencode":
                self._send(503, {"error": "degraded: model not loaded"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(length) or b"{}")
                self._send(200, fn(body))
            except PermissionError as e:
                self._send(403, {"error": str(e)})
            except FileNotFoundError as e:
                self._send(404, {"error": str(e)})
            except Exception as e:
                traceback.print_exc()
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):
            pass

    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"rife_tpu HTTP API on {host}:{port} "
          f"({'ready' if engine else 'DEGRADED - no model'})")
    httpd.serve_forever()


# ---------------------------------------------------------------- Gradio UI


def build_gradio(engine):
    import gradio as gr

    degraded = engine is None

    def _pair(img0, img1, passes, fps, disk):
        out = str(config.OUTPUT_DIR / "pair.mp4")
        r = services.interpolate_pair_to_video(
            engine, np.asarray(img0, np.float32) / 255.0,
            np.asarray(img1, np.float32) / 255.0, out,
            passes=int(passes), fps=float(fps), disk_based=bool(disk))
        return out, json.dumps(r)

    def _video(path, exp):
        out = str(config.OUTPUT_DIR / "video.mp4")
        r = services.interpolate_video_file(engine, path, out, exp=int(exp))
        return out, json.dumps(r)

    def _chain(v1, v2, v3):
        out = str(config.OUTPUT_DIR / "chained.mp4")
        vids = [v for v in (v1, v2, v3) if v]
        r = services.chained_transitions(engine, vids, out)
        return out, json.dumps(r)

    def _extract(path, limit):
        from rife_tpu.video.framing import extract_frames

        d = str(config.FRAMES_DIR)
        n = extract_frames(path, d, int(limit) if limit else None)
        return f"extracted {n} frames to {d}"

    def _reencode(path):
        out = str(config.OUTPUT_DIR / "reencoded.mp4")
        r = services.reencode_video(path, out)
        return out, json.dumps(r)

    with gr.Blocks(title="RIFE-TPU") as demo:
        gr.Markdown("# RIFE-TPU video frame interpolation"
                    + (" — **DEGRADED: model not loaded**" if degraded else ""))
        with gr.Tab("Frame extraction"):
            v = gr.Video()
            lim = gr.Number(label="limit", value=0)
            btn = gr.Button("Extract")
            out = gr.Textbox()
            btn.click(_extract, [v, lim], out)
        with gr.Tab("Image pair → video"):
            i0, i1 = gr.Image(), gr.Image()
            passes = gr.Slider(1, 8, value=4, step=1, label="2^n passes")
            fps = gr.Number(value=config.DEFAULT_FPS, label="fps")
            disk = gr.Checkbox(label="disk-based (O(1) memory)")
            btn2 = gr.Button("Interpolate", interactive=not degraded)
            vid, info = gr.Video(), gr.Textbox()
            btn2.click(_pair, [i0, i1, passes, fps, disk], [vid, info])
        with gr.Tab("Chained transitions"):
            v1, v2, v3 = gr.Video(), gr.Video(), gr.Video()
            btn3 = gr.Button("Chain", interactive=not degraded)
            vid3, info3 = gr.Video(), gr.Textbox()
            btn3.click(_chain, [v1, v2, v3], [vid3, info3])
        with gr.Tab("Video interpolation"):
            v4 = gr.Video()
            exp = gr.Slider(1, 4, value=1, step=1, label="exp (2^n X)")
            btn4 = gr.Button("Interpolate", interactive=not degraded)
            vid4, info4 = gr.Video(), gr.Textbox()
            btn4.click(_video, [v4, exp], [vid4, info4])
        with gr.Tab("Re-encode"):
            v5 = gr.Video()
            btn5 = gr.Button("Re-encode")
            vid5, info5 = gr.Video(), gr.Textbox()
            btn5.click(_reencode, [v5], [vid5, info5])
    return demo


def main(argv=None):
    from rife_tpu.cli._common import enable_compilation_cache

    enable_compilation_cache()

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default=config.SERVER_NAME)
    ap.add_argument("--port", type=int, default=config.SERVER_PORT)
    ap.add_argument("--modelDir", default=None)
    ap.add_argument("--http", action="store_true", help="force the JSON API frontend")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip startup compilation of the common shape bucket")
    args = ap.parse_args(argv)

    config.ensure_dirs()
    engine = load_engine(args.modelDir)

    if engine is not None and not args.no_warmup:
        # Pre-compile the service layer's most common bucket (the
        # centered min-512 %32 pad contract) so the FIRST request isn't
        # a multi-minute compile on tunneled stacks.
        try:
            engine.warmup((1, 512, 512, 3))
        except Exception:
            traceback.print_exc()

    if not args.http:
        try:
            demo = build_gradio(engine)
            auth = None
            if config.AUTH_USERNAME and config.AUTH_PASSWORD:
                auth = (config.AUTH_USERNAME, config.AUTH_PASSWORD)
            demo.launch(server_name=args.host, server_port=args.port, auth=auth)
            return
        except ImportError:
            print("gradio not installed; falling back to the JSON HTTP API")
    serve_http(engine, args.host, args.port)


if __name__ == "__main__":
    main()
