"""Dependency-free interactive web viewer for trained scenes.

Reference role: the playground GUIs (threedgrut_playground/ps_gui.py —
polyscope — and viser_gui.py — web). Neither polyscope nor viser is required
here: this is a self-contained stdlib HTTP server + HTML/JS orbit-control
client. The browser requests frames from /render?yaw=..&pitch=..&radius=..;
the server renders with the playground Engine (or plain 3DGUT raster) and
streams JPEG.

Usage:  viewer = WebViewer(engine); viewer.serve(port=8080)
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>threedgrut_tpu viewer</title>
<style>body{margin:0;background:#111;color:#eee;font-family:monospace}
#hud{position:fixed;top:8px;left:8px}</style></head>
<body>
<img id="view" width="%(w)d" height="%(h)d" draggable="false">
<div id="hud">drag: orbit | wheel: zoom | h: hybrid</div>
<script>
let yaw=0.6, pitch=0.4, radius=4.0, drag=false, lx=0, ly=0, hybrid=0;
let pending=false;
const img=document.getElementById('view');
function refresh(){
  if(pending) return; pending=true;
  const u=`/render?yaw=${yaw}&pitch=${pitch}&radius=${radius}&hybrid=${hybrid}`;
  fetch(u).then(r=>r.blob()).then(b=>{
    img.src=URL.createObjectURL(b); pending=false;});
}
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
  yaw+=(e.clientX-lx)*0.01; pitch+=(e.clientY-ly)*0.01;
  pitch=Math.max(-1.5,Math.min(1.5,pitch)); lx=e.clientX;ly=e.clientY;
  refresh();};
window.onwheel=e=>{radius*=Math.exp(e.deltaY*0.001); refresh();};
window.onkeydown=e=>{if(e.key=='h'){hybrid=1-hybrid; refresh();}};
refresh();
</script></body></html>
"""


class WebViewer:
    def __init__(self, engine, resolution: Tuple[int, int] = (400, 400),
                 target=(0.0, 0.0, 0.0), focal_factor: float = 0.9):
        self.engine = engine
        self.resolution = resolution
        self.target = np.asarray(target, np.float32)
        self.focal_factor = focal_factor
        self._lock = threading.Lock()

    def _camera(self):
        import jax.numpy as jnp
        from threedgrut_tpu.cameras import PinholeCamera
        w, h = self.resolution
        f = self.focal_factor * w
        return PinholeCamera(
            focal=jnp.asarray([f, f], jnp.float32),
            principal=jnp.asarray([w / 2, h / 2], jnp.float32),
            radial=jnp.zeros(6), tangential=jnp.zeros(2),
            thin_prism=jnp.zeros(4))

    def render_frame(self, yaw: float, pitch: float, radius: float,
                     hybrid: bool = False) -> np.ndarray:
        import jax.numpy as jnp
        from threedgrut_tpu.datasets.dataset_synthetic import look_at
        eye = self.target + radius * np.array([
            np.cos(pitch) * np.cos(yaw), np.cos(pitch) * np.sin(yaw),
            np.sin(pitch)], np.float32)
        T = jnp.asarray(look_at(eye, self.target,
                                np.array([0, 0, 1], np.float32)))
        with self._lock:
            fn = (self.engine.render_hybrid if hybrid
                  else self.engine.render)
            out = fn(self._camera(), T, self.resolution)
        return np.clip(np.asarray(out["rgb"]), 0.0, 1.0)

    def _encode_jpeg(self, rgb: np.ndarray) -> bytes:
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            buf, format="JPEG", quality=90)
        return buf.getvalue()

    def make_handler(viewer):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    w, h = viewer.resolution
                    body = (_PAGE % {"w": w, "h": h}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                elif u.path == "/render":
                    q = parse_qs(u.query)

                    def val(k, dflt):
                        return float(q.get(k, [dflt])[0])
                    rgb = viewer.render_frame(
                        val("yaw", 0.6), val("pitch", 0.4),
                        val("radius", 4.0),
                        hybrid=val("hybrid", 0) > 0.5)
                    body = viewer._encode_jpeg(rgb)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(body)
                elif u.path == "/info":
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps(
                        {"resolution": viewer.resolution}).encode())
                else:
                    self.send_response(404)
                    self.end_headers()
        return Handler

    def serve(self, port: int = 8080, blocking: bool = True):
        server = ThreadingHTTPServer(("0.0.0.0", port), self.make_handler())
        print(f"viewer at http://localhost:{port}/", flush=True)
        if blocking:
            server.serve_forever()
        else:
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
        return server
