"""Interactive viewer: a lightweight web front end.

The reference's interactive layer is an imgui/glium GL window
(app/window.rs, app/ui.rs) — no GL stack exists on a TPU host, so the
equivalent surface is a local HTTP viewer: live progressive image, render
controls (integrator, sampler, spp, resolution, tonemap), camera orbit/dolly
controls, and render/kill buttons.  Renders run through the same Renderer
facade; settings changes debounce-retrigger renders like the reference's
32 ms debounce (window.rs:531-593).
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..camera import CameraParameters, FoV
from ..film import Film, FilmSettings, film_or_new
from ..integrators import PathParams, WhittedParams
from ..renderer import Renderer, RenderFinished, RenderProgress, RenderSettings
from ..sampling import StratifiedSampler, UniformSampler
from ..tonemap import FilmicParams, HeatmapParams, filmic, heatmap
from .settings import InitialSettings
from .util import try_load_scene

_PAGE = """<!DOCTYPE html>
<html><head><title>yuki-tpu</title>
<style>
 body { background:#181818; color:#ddd; font-family:monospace; margin:0; display:flex; }
 #panel { width: 320px; padding: 12px; background:#222; min-height:100vh; }
 #panel label { display:block; margin-top:8px; font-size: 12px; }
 #panel input, #panel select { width: 95%; background:#333; color:#ddd; border:1px solid #555; }
 #img { image-rendering: pixelated; max-width: calc(100vw - 360px); }
 button { margin-top:10px; background:#2a6; border:0; color:#fff; padding:6px 14px; cursor:pointer; }
 button.red { background:#a33; }
 #status { white-space: pre; font-size: 11px; margin-top: 10px; color:#9c9; }
</style></head>
<body>
<div id="panel">
 <h3>yuki-tpu</h3>
 <label>Integrator
  <select id="integrator">
   <option>Path</option><option>Whitted</option>
   <option>GeometryNormals</option><option>ShadingNormals</option>
   <option>ShadingUVs</option><option>BVHIntersections</option>
  </select></label>
 <label>Max depth <input id="max_depth" type="number" value="3" min="1" max="12"></label>
 <label>Sampler
  <select id="sampler"><option>Stratified</option><option>Uniform</option></select></label>
 <label>Samples/pixel <input id="spp" type="number" value="4" min="1" max="4096"></label>
 <label>Resolution <input id="res" value="640x480"></label>
 <label>Exposure <input id="exposure" type="number" step="0.1" value="1.0"></label>
 <label>Tonemap
  <select id="tonemap"><option>Filmic</option><option>Raw</option><option>Heatmap</option></select></label>
 <label><input id="accumulate" type="checkbox" style="width:auto"> accumulate</label>
 <label><input id="quarter" type="checkbox" style="width:auto"> 1/16 res preview</label>
 <button onclick="render()">Render</button>
 <button class="red" onclick="fetch('/kill', {method:'POST'})">Kill</button>
 <div id="status">idle</div>
 <h4>Camera</h4>
 <label>Position <input id="cam_pos" value=""></label>
 <label>Target <input id="cam_target" value=""></label>
 <label>FoV <input id="cam_fov" type="number" value="40"></label>
</div>
<div><img id="img" src="/image.png"></div>
<script>
async function render() {
  const body = {
    integrator: document.getElementById('integrator').value,
    max_depth: +document.getElementById('max_depth').value,
    sampler: document.getElementById('sampler').value,
    spp: +document.getElementById('spp').value,
    res: document.getElementById('res').value,
    exposure: +document.getElementById('exposure').value,
    tonemap: document.getElementById('tonemap').value,
    accumulate: document.getElementById('accumulate').checked,
    sixteenth: document.getElementById('quarter').checked,
    cam_pos: document.getElementById('cam_pos').value,
    cam_target: document.getElementById('cam_target').value,
    cam_fov: +document.getElementById('cam_fov').value,
  };
  await fetch('/render', {method:'POST', body: JSON.stringify(body)});
}
setInterval(async () => {
  const s = await (await fetch('/status')).json();
  document.getElementById('status').textContent = s.text;
  if (s.dirty) document.getElementById('img').src = '/image.png?' + Date.now();
}, 500);
</script>
</body></html>
"""


class ViewerState:
    def __init__(self, settings: InitialSettings):
        self.settings = settings
        self.scene, self.cam_params, scene_fs, _ = try_load_scene(
            settings.load_settings
        )
        self.film: Film | None = None
        self.renderer = Renderer()
        self.status_text = "idle"
        self.tonemap_kind = "Filmic"
        self.exposure = 1.0
        self.lock = threading.Lock()

    def start_render(self, cfg: dict):
        res = cfg.get("res", "640x480")
        try:
            rx, ry = (int(v) for v in res.lower().split("x"))
        except ValueError:
            rx, ry = 640, 480
        fs = FilmSettings(
            res=(rx, ry),
            accumulate=bool(cfg.get("accumulate")),
            sixteenth_res=bool(cfg.get("sixteenth")),
        )
        kind = cfg.get("integrator", "Path")
        depth = int(cfg.get("max_depth", 3))
        if kind == "Path":
            integrator = PathParams(max_depth=depth)
        elif kind == "Whitted":
            integrator = WhittedParams(max_depth=depth)
        else:
            integrator = {
                "GeometryNormals": "geometry_normals",
                "ShadingNormals": "shading_normals",
                "ShadingUVs": "shading_uvs",
                "BVHIntersections": "bvh_intersections",
            }[kind]
        spp = int(cfg.get("spp", 4))
        if cfg.get("sampler", "Stratified") == "Uniform":
            sampler = UniformSampler(pixel_samples=spp)
        else:
            side = max(1, int(round(spp ** 0.5)))
            sampler = StratifiedSampler(pixel_samples_x=side, pixel_samples_y=side)
        self.tonemap_kind = cfg.get("tonemap", "Filmic")
        self.exposure = float(cfg.get("exposure", 1.0))
        cam = self.cam_params
        for key, attr in (("cam_pos", "position"), ("cam_target", "target")):
            if cfg.get(key):
                try:
                    vals = tuple(float(v) for v in cfg[key].split(","))
                    setattr(cam, attr, vals)
                except ValueError:
                    pass
        if cfg.get("cam_fov"):
            cam.fov = FoV(cam.fov.axis, float(cfg["cam_fov"]))
        with self.lock:
            self.film = film_or_new(self.film, fs)
            self.renderer.launch(
                self.scene, cam, self.film, sampler, integrator, fs,
                RenderSettings(),
            )

    def poll(self) -> dict:
        dirty = False
        for msg in self.renderer.check_status():
            if isinstance(msg, RenderProgress):
                self.status_text = (
                    f"{msg.tiles_done}/{msg.tiles_total} tiles\n"
                    f"{msg.rays_per_sec / 1e6:.2f} Mrays/s\n"
                    f"ETA {msg.approx_remaining_s:.1f}s"
                )
                dirty = True
            elif isinstance(msg, RenderFinished):
                self.status_text = (
                    f"done: {msg.ray_count / 1e6:.2f} Mrays in {msg.elapsed_s:.2f}s\n"
                    f"{msg.ray_count / max(msg.elapsed_s, 1e-9) / 1e6:.2f} Mrays/s"
                )
                dirty = True
        return {"text": self.status_text, "dirty": dirty}

    def image_png(self) -> bytes:
        from PIL import Image

        with self.lock:
            if self.film is None:
                img = np.zeros((480, 640, 3), np.float32)
            else:
                img = self.film.image_device()
                if self.tonemap_kind == "Filmic":
                    img = filmic(img, FilmicParams(exposure=self.exposure))
                elif self.tonemap_kind == "Heatmap":
                    mn = float(img.min())
                    mx = float(img.max())
                    img = heatmap(img, HeatmapParams(min_val=mn, max_val=max(mx, mn + 1e-6)))
                img = np.asarray(img)
        srgb = np.where(
            img <= 0.0031308, 12.92 * img, 1.055 * np.clip(img, 0, 1) ** (1 / 2.4) - 0.055
        )
        buf = io.BytesIO()
        Image.fromarray((np.clip(srgb, 0, 1) * 255).astype(np.uint8)).save(
            buf, format="PNG"
        )
        return buf.getvalue()


def serve(settings: InitialSettings, port: int = 8000):
    state = ViewerState(settings)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/image.png"):
                self._send(200, "image/png", state.image_png())
            elif self.path.startswith("/status"):
                self._send(200, "application/json", json.dumps(state.poll()).encode())
            else:
                self._send(200, "text/html", _PAGE.encode())

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n) if n else b"{}"
            if self.path == "/render":
                state.start_render(json.loads(body or b"{}"))
                self._send(200, "application/json", b"{}")
            elif self.path == "/kill":
                state.renderer.kill()
                self._send(200, "application/json", b"{}")
            else:
                self._send(404, "text/plain", b"")

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"yuki-tpu viewer on http://127.0.0.1:{port}")
    server.serve_forever()
